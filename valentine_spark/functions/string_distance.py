"""String-distance kernels.

The default (Levenshtein) path never touches these — it uses the JVM built-in
``F.levenshtein`` inside whole-stage codegen.  The exotic distances the
reference pulls from jellyfish (``jaccard_distance.py:92-111``) have no Spark
built-in, so they are Arrow-batched pandas UDFs (Series -> Series), the fast
Python path mandated by BASELINE.json's "no per-row Python" rule — Python is
invoked once per ~10k-row Arrow batch, not once per row.

Semantics match jellyfish:
  * damerau_levenshtein: true Damerau (adjacent transposition) distance;
  * hamming: positional mismatches, unequal lengths padded (length delta
    counts as mismatches);
  * jaro / jaro_winkler: standard definitions, winkler prefix scale 0.1,
    boost threshold 0.7, max prefix 4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType


def _damerau_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    # classic DP over two strings with transposition row memory
    da: dict = {}
    maxdist = la + lb
    d = np.zeros((la + 2, lb + 2), dtype=np.int32)
    d[0, 0] = maxdist
    d[1:, 0] = maxdist
    d[0, 1:] = maxdist
    d[1, 1:] = np.arange(lb + 1)
    d[1:, 1] = np.arange(la + 1)
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1, j + 1] = min(
                d[i, j] + cost,
                d[i + 1, j] + 1,
                d[i, j + 1] + 1,
                d[k, l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return int(d[la + 1, lb + 1])


def _hamming(a: str, b: str) -> int:
    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
    mism = sum(1 for x, y in zip(short, long_) if x != y)
    return mism + (len(long_) - len(short))


def _jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ch:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    trans = 0
    j = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[j]:
                j += 1
            if a[i] != b[j]:
                trans += 1
            j += 1
    trans //= 2
    m = float(matches)
    return (m / la + m / lb + (m - trans) / m) / 3.0


def _jaro_winkler(a: str, b: str) -> float:
    j = _jaro(a, b)
    if j > 0.7:
        prefix = 0
        for x, y in zip(a[:4], b[:4]):
            if x == y:
                prefix += 1
            else:
                break
        j += prefix * 0.1 * (1.0 - j)
    return j


def _pairwise(fn):
    def apply(left: pd.Series, right: pd.Series) -> pd.Series:
        l = left.fillna("").astype(str).to_numpy()
        r = right.fillna("").astype(str).to_numpy()
        return pd.Series([fn(a, b) for a, b in zip(l, r)])

    return apply


@pandas_udf(IntegerType())
def damerau_levenshtein_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    return _pairwise(_damerau_levenshtein)(left, right)


@pandas_udf(IntegerType())
def hamming_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    return _pairwise(_hamming)(left, right)


@pandas_udf(DoubleType())
def jaro_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    return _pairwise(_jaro)(left, right)


@pandas_udf(DoubleType())
def jaro_winkler_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    return _pairwise(_jaro_winkler)(left, right)


def levenshtein_scalar(a: str, b: str) -> int:
    """Plain Levenshtein for DRIVER-side use (Cupid / Similarity Flooding
    compare column NAMES — dozens of strings, not data rows; the data-plane
    path is Spark's built-in ``F.levenshtein``).  Two-row DP, O(len(a)*len(b))."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalized_similarity_expr(distance_col, left_col, right_col):
    """sim = 1 - dist / max(len(a), len(b), 1)  (reference utils.py:25-41),
    as a pure column expression (stays in codegen)."""
    return 1.0 - distance_col / F.greatest(
        F.length(left_col), F.length(right_col), F.lit(1)
    )
