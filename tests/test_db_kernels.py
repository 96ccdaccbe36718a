"""Numpy-kernel unit tests for the distribution-based matcher, including
validation of the EMD-as-CDF-L1 identity against a brute-force optimal
transport solve (replacing the reference's POT dependency — SURVEY.md §4.4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from valentine_spark.matchers.distribution_based.kernels import (
    boundaries_to_ranges,
    bucket_search,
    bucket_values,
    emd_1d,
    histogram_boundaries,
    intersect_multisets,
    rank_counts,
    weighted_quantiles,
)


def brute_force_emd(h1, h2, cost):
    """North-west-corner-free exact 1-D transport: for sorted 1-D supports
    with convex cost, greedy left-to-right matching is optimal."""
    supply = list(h1 / h1.sum())
    demand = list(h2 / h2.sum())
    total = 0.0
    i = j = 0
    while i < len(supply) and j < len(demand):
        moved = min(supply[i], demand[j])
        total += moved * cost[i][j]
        supply[i] -= moved
        demand[j] -= moved
        if supply[i] <= 1e-15:
            i += 1
        if j < len(demand) and demand[j] <= 1e-15:
            j += 1
    return total


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.floats(0.01, 10.0), min_size=2, max_size=40),
    st.lists(st.floats(0.01, 10.0), min_size=2, max_size=40),
)
def test_emd_identity_vs_transport(h1, h2):
    h1, h2 = np.array(h1), np.array(h2)
    n = max(len(h1), len(h2))
    h1 = np.pad(h1, (0, n - len(h1)))
    h2 = np.pad(h2, (0, n - len(h2)))
    cost = [[abs(i - j) / n for j in range(n)] for i in range(n)]
    expected = brute_force_emd(h1, h2, cost)
    assert emd_1d(h1, h2) == pytest.approx(expected, abs=1e-9)


def test_weighted_quantiles_match_numpy():
    rng = np.random.default_rng(7)
    data = rng.integers(1, 500, size=1000).astype(float)
    vals, counts = rank_counts(data)
    qs = np.arange(1, 257) / 257
    expected = np.quantile(np.sort(data), qs, method="linear")
    got = weighted_quantiles(vals, counts, qs)
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_boundaries_match_statistics_quantiles():
    import statistics

    data = np.array([1.0, 2, 2, 3, 5, 8, 13, 21, 34, 55])
    vals, counts = rank_counts(data)
    got = histogram_boundaries(vals, counts, n_quantiles=4)
    expected = sorted(set(round(q, 3) for q in statistics.quantiles(data, n=5, method="inclusive")))
    np.testing.assert_allclose(got, np.array(expected))


def test_bucket_search_matches_reference_semantics():
    # replicate the reference's scalar binary search and compare
    def scalar_search(x, ranges):
        left, right = 0, len(ranges) - 1
        while left <= right:
            mid = left + (right - left) // 2
            if ranges[mid][0] <= x <= ranges[mid][1]:
                return mid
            elif ranges[mid][1] < x:
                left = mid + 1
            else:
                right = mid - 1
        return -1

    bb = np.array([2.0, 4.0, 6.0, 8.0])
    lo, hi = boundaries_to_ranges(1.0, bb)
    ranges = list(zip(lo, hi))
    xs = np.array([0.5, 1.0, 2.0, 3.0, 4.0, 5.5, 6.0, 8.0, 9.0])
    got = bucket_search(xs, lo, hi)
    expected = np.array([scalar_search(x, ranges) for x in xs])
    np.testing.assert_array_equal(got, expected)


def test_bucket_values_normalization():
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    counts = np.array([1, 2, 3, 4])
    lo, hi = boundaries_to_ranges(1.0, np.array([2.0, 4.0]))
    out = bucket_values(vals, counts, lo, hi, normalization=10.0)
    assert out.sum() == pytest.approx(1.0)


def test_intersect_multisets():
    v1, c1 = np.array([1.0, 2.0, 3.0]), np.array([2, 1, 1])
    v2, c2 = np.array([2.0, 3.0, 4.0]), np.array([5, 1, 9])
    iv, ic = intersect_multisets(v1, c1, v2, c2)
    np.testing.assert_array_equal(iv, [2.0, 3.0])
    np.testing.assert_array_equal(ic, [6, 2])

    iv0, _ = intersect_multisets(v1, c1, np.array([9.0]), np.array([1]))
    assert len(iv0) == 0
