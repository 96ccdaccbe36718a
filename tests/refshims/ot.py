"""Pure-Python shim for POT's ``ot.emd2`` (the only symbol the reference
imports, ``distribution_based/emd_utils.py:2``).

The reference always calls it with 1-D histograms and the cost matrix
``M[i][j] = |i-j| / n`` (``quantile_histogram.py:172-189``) — a Monge
matrix (M[i][j] + M[i+1][j+1] <= M[i][j+1] + M[i+1][j] for any convex
function of |i-j|).  For Monge costs the northwest-corner greedy transport
plan is the EXACT optimum, so this shim computes true EMD for every call
the reference makes.  The Monge property is asserted on a sample to guard
against misuse with a non-Monge matrix.
"""

import numpy as np


def _assert_monge_sample(M):
    M = np.asarray(M, dtype=float)
    n, m = M.shape
    for i in range(0, n - 1, max(1, n // 8)):
        for j in range(0, m - 1, max(1, m // 8)):
            if M[i][j] + M[i + 1][j + 1] > M[i][j + 1] + M[i + 1][j] + 1e-12:
                raise ValueError("refshim ot.emd2: cost matrix is not Monge; "
                                 "greedy transport would not be optimal")


def emd2(a, b, M):
    a = np.asarray(a, dtype=float).copy()
    b = np.asarray(b, dtype=float).copy()
    M = np.asarray(M, dtype=float)
    if abs(a.sum() - b.sum()) > 1e-9:
        raise ValueError("refshim ot.emd2: marginals must have equal mass")
    _assert_monge_sample(M)
    i = j = 0
    cost = 0.0
    ai, bj = a[0], b[0]
    n, m = len(a), len(b)
    while i < n and j < m:
        move = min(ai, bj)
        cost += move * M[i][j]
        ai -= move
        bj -= move
        if ai <= 1e-15 and i + 1 < n:
            i += 1
            ai = a[i]
        elif bj <= 1e-15 and j + 1 < m:
            j += 1
            bj = b[j]
        elif ai <= 1e-15 and bj <= 1e-15:
            break
        elif ai <= 1e-15 or bj <= 1e-15:
            # one side exhausted with residual mass on the other -> numerical
            # dust; drop it (marginals were verified equal above)
            break
    return float(cost)
