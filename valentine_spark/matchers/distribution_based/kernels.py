"""Vectorized numpy kernels for the distribution-based matcher.

These reproduce the quantile-histogram + EMD math of the reference
(``/root/reference/valentine/algorithms/distribution_based/quantile_histogram.py``
and ``emd_utils.py``) in fully vectorized form, so Spark can run them inside
Arrow-batched UDFs (no per-row Python):

  * equi-depth boundaries = ``statistics.quantiles(ranks, n=q+1,
    method='inclusive')`` == linear-interpolation quantiles at i/(q+1),
    rounded to 3 decimals and de-duplicated (we keep them SORTED; the
    reference's ``list(set(...))`` ordering is only sorted by accident for
    small integer-valued floats — quantile_histogram.py:64-69);
  * bucketing replicates the reference's inclusive-range binary search
    (quantile_histogram.py:147-170) including its tie behavior on shared
    bucket edges, vectorized as a lock-step binary search;
  * 1-D EMD with cost |i-j|/n equals the L1 distance of the bucket CDFs
    divided by n — an algebraic identity that removes the reference's POT
    LP-solver dependency (emd_utils.py:8-41); validated in tests against a
    brute-force transport solve.

Columns are represented compactly as (ranks, counts) multisets: exact, yet
orders of magnitude smaller than raw arrays for repetitive columns.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def rank_counts(ranks: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Compress a rank multiset to (unique sorted ranks, counts)."""
    u, c = np.unique(np.asarray(ranks, dtype=np.float64), return_counts=True)
    return u, c.astype(np.int64)


def weighted_quantiles(values: np.ndarray, counts: np.ndarray, qs: np.ndarray) -> np.ndarray:
    """Linear-interpolation quantiles of the expanded multiset, computed from
    the compressed form.  Equivalent to ``np.quantile(expanded, qs,
    method='linear')`` == ``statistics.quantiles(..., method='inclusive')``
    at qs = i/n."""
    n = int(counts.sum())
    if n == 0:
        return np.array([])
    if n == 1:
        return np.repeat(values[0], len(qs))
    cum = np.cumsum(counts)  # cum[i] = # elements <= values[i]
    pos = qs * (n - 1)  # fractional order statistics
    lo_idx = np.floor(pos).astype(np.int64)
    frac = pos - lo_idx
    # k-th order statistic (0-based) = values[searchsorted(cum, k+1)]
    lo_val = values[np.searchsorted(cum, lo_idx + 1)]
    hi_val = values[np.searchsorted(cum, np.minimum(lo_idx + 1, n - 1) + 1)]
    return lo_val + frac * (hi_val - lo_val)


def histogram_boundaries(values: np.ndarray, counts: np.ndarray, n_quantiles: int) -> np.ndarray:
    """Sorted unique rounded quantile cut points (reference :64-69).  For a
    single-element multiset the boundaries are just that element."""
    n = int(counts.sum())
    if n <= 1:
        return values.astype(np.float64)
    qs = np.arange(1, n_quantiles + 1, dtype=np.float64) / (n_quantiles + 1)
    cuts = np.round(weighted_quantiles(values, counts, qs), 3)
    return np.unique(cuts)


def bucket_search(x: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Vectorized replica of the reference's inclusive-range binary search
    (quantile_histogram.py:147-170): returns the bucket index whose
    [lo, hi] contains x, -1 if none — matching the reference's probe order
    on shared edges (a value equal to a shared boundary lands in whichever
    bucket the midpoint probe sequence visits first)."""
    n = len(lo)
    x = np.asarray(x, dtype=np.float64)
    left = np.zeros(len(x), dtype=np.int64)
    right = np.full(len(x), n - 1, dtype=np.int64)
    result = np.full(len(x), -1, dtype=np.int64)
    active = left <= right
    while active.any():
        mid = left + (right - left) // 2
        in_bucket = active & (lo[np.clip(mid, 0, n - 1)] <= x) & (x <= hi[np.clip(mid, 0, n - 1)])
        result[in_bucket] = mid[in_bucket]
        go_right = active & ~in_bucket & (hi[np.clip(mid, 0, n - 1)] < x)
        go_left = active & ~in_bucket & ~go_right
        left[go_right] = mid[go_right] + 1
        right[go_left] = mid[go_left] - 1
        active = active & ~in_bucket & (left <= right)
    return result


def boundaries_to_ranges(min_val: float, bb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Bucket ranges: bucket 0 = (min_val, bb[0]); bucket i = (bb[i-1], bb[i])
    (reference add_buckets, quantile_histogram.py:100-117)."""
    if len(bb) == 0:
        return np.array([min_val]), np.array([min_val])
    lo = np.concatenate(([min_val], bb[:-1]))
    hi = bb
    return lo.astype(np.float64), hi.astype(np.float64)


def bucket_values(
    values: np.ndarray, counts: np.ndarray, lo: np.ndarray, hi: np.ndarray, normalization: float
) -> np.ndarray:
    """Weighted bucket counts of the multiset, normalized by ``normalization``
    (the column size — reference add_values/normalize_values)."""
    out = np.zeros(len(lo), dtype=np.float64)
    if len(values):
        idx = bucket_search(values, lo, hi)
        ok = idx >= 0
        np.add.at(out, idx[ok], counts[ok].astype(np.float64))
    return out / normalization if normalization else out


def emd_1d(h1: np.ndarray, h2: np.ndarray) -> float:
    """EMD with ground cost |i-j|/n between normalized histograms == L1 of
    CDFs / n (identity replacing ot.emd2 — validated in tests)."""
    n = len(h1)
    if n == 0:
        return math.inf
    s1, s2 = h1.sum(), h2.sum()
    if s1 == 0 or s2 == 0:
        return math.inf
    return float(np.abs(np.cumsum(h1 / s1 - h2 / s2)).sum() / n)


def quantile_emd_kernel(
    min1: float,
    bb1: np.ndarray,
    hist1: np.ndarray,
    size2: int,
    values2: np.ndarray,
    counts2: np.ndarray,
) -> float:
    """EMD(c1, c2) with c2 re-bucketed into c1's boundaries
    (reference emd_utils.py:8-41)."""
    if size2 == 0 or len(hist1) == 0:
        return math.inf
    lo, hi = boundaries_to_ranges(min1, bb1)
    h2 = bucket_values(values2, counts2, lo, hi, float(size2))
    if h2.sum() == 0:
        return math.inf
    return emd_1d(hist1, h2)


def intersect_multisets(
    v1: np.ndarray, c1: np.ndarray, v2: np.ndarray, c2: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Multiset of elements of (v1,c1)+(v2,c2) whose value appears in both —
    the ``C1 ∩ C2`` column of intersection_emd (emd_utils.py:73-81), with the
    reference's duplicate-preserving concatenation semantics."""
    common, i1, i2 = np.intersect1d(v1, v2, return_indices=True)
    if len(common) == 0:
        return np.array([]), np.array([], dtype=np.int64)
    return common, (c1[i1] + c2[i2]).astype(np.int64)


def column_histogram(values: np.ndarray, counts: np.ndarray, n_quantiles: int):
    """Full own-histogram of a column: returns (min_rank, boundaries, hist,
    size).  hist is normalized by column size (reference process_columns)."""
    size = int(counts.sum())
    if size == 0:
        return 0.0, np.array([]), np.array([]), 0
    bb = histogram_boundaries(values, counts, n_quantiles)
    min_rank = float(values[0])
    lo, hi = boundaries_to_ranges(min_rank, bb)
    hist = bucket_values(values, counts, lo, hi, float(size))
    return min_rank, bb, hist, size


def intersection_emd_kernel(
    col1: dict,
    col2: dict,
    n_quantiles: int,
) -> float:
    """Intersection_EMD(C, C') = (EMD(C, C∩C') + EMD(C', C∩C')) / 2
    (emd_utils.py:44-91).  cols are dicts with keys
    min/bb/hist/size/values/counts."""
    iv, ic = intersect_multisets(col1["values"], col1["counts"], col2["values"], col2["counts"])
    if len(iv) == 0:
        return math.inf
    isize = int(ic.sum())
    e1 = quantile_emd_kernel(col1["min"], col1["bb"], col1["hist"], isize, iv, ic)
    e2 = quantile_emd_kernel(col2["min"], col2["bb"], col2["hist"], isize, iv, ic)
    return (e1 + e2) / 2.0
