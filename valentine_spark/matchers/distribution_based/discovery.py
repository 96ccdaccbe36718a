"""Driver-side clustering steps of the distribution-based matcher.

All inputs here are O(#columns²) similarity matrices — tiny — so this module
is plain Python by design (SURVEY.md §4.5).  Reference:
``/root/reference/valentine/algorithms/distribution_based/discovery.py`` and
``clustering_utils.py:14-42``.

Correlation clustering note: the reference formulates a PuLP/CBC ILP
(discovery.py:506-557) that minimizes Σ x_ij over +edges + Σ (1-x_ij) over
-edges with NO transitivity constraints — its exact optimum is therefore
closed-form: x_ij = 0 on +edges, 1 on -edges, and "co-clustered pairs"
(x = 0) are exactly the +edges.  We use that closed form directly; no MIP
solver is needed to reproduce the reference output.
"""

from __future__ import annotations

import math
from typing import Dict, Hashable, List, Sequence, Set, Tuple

import numpy as np

from ...utils.graphs import connected_components


def compute_cutoff_threshold(neighbors: List[dict], threshold: float) -> float:
    """Algorithm 1 of Zhang et al.: sort neighbor EMDs ascending (with a
    sentinel at the global threshold), take the left edge of the largest gap
    below the threshold (clustering_utils.py:14-42)."""
    entries = sorted(neighbors + [{"e": threshold, "c": 0}], key=lambda d: d["e"])
    cutoff, gap = 0.0, 0.0
    for i in range(len(entries) - 1):
        if entries[i + 1]["e"] > threshold:
            break
        step = entries[i + 1]["e"] - entries[i]["e"]
        if gap < step:
            gap, cutoff = step, entries[i]["e"]
    return cutoff


def neighbors_from_pair_emds(pair_emds: Dict[Tuple[Hashable, Hashable], float]) -> Dict[Hashable, List[dict]]:
    """matrix_a layout of the reference (clustering_utils.py:160-177):
    per column, the list of {e: emd, c: other column} in both directions."""
    out: Dict[Hashable, List[dict]] = {}
    for (a, b), e in pair_emds.items():
        out.setdefault(a, []).append({"e": e, "c": b})
        out.setdefault(b, []).append({"e": e, "c": a})
    return out


def distribution_clusters(
    columns: Sequence[Hashable],
    pair_emds: Dict[Tuple[Hashable, Hashable], float],
    threshold: float,
) -> List[Set[Hashable]]:
    """Algorithm 2: per-column cutoff → neighbor edges → connected
    components (discovery.py:331-367)."""
    matrix = neighbors_from_pair_emds(pair_emds)
    edges: List[Tuple[Hashable, Hashable]] = []
    for col in columns:
        neigh = matrix.get(col, [])
        theta = compute_cutoff_threshold(list(neigh), threshold)
        edges.extend((col, item["c"]) for item in neigh if item["e"] <= theta)
    return connected_components(columns, edges)


def attribute_edges(
    cluster: Sequence[Hashable],
    pair_iemds: Dict[Tuple[Hashable, Hashable], float],
    threshold: float,
) -> List[Tuple[Hashable, Hashable]]:
    """Algorithm 3: cutoff per cluster member over intersection-EMDs →
    boolean matrix E → M = E + E·E → pairs with M > 0 are +edges, i.e. the
    exact solution of the reference's degenerate correlation-clustering ILP
    (discovery.py:479-557; see module docstring)."""
    n = len(cluster)
    index = {c: i for i, c in enumerate(cluster)}
    matrix = neighbors_from_pair_emds(pair_iemds)
    E = np.zeros((n, n))
    for col in cluster:
        neigh = matrix.get(col, [])
        cutoff = compute_cutoff_threshold(list(neigh), threshold)
        for item in neigh:
            if item["e"] <= cutoff:
                E[index[col], index[item["c"]]] = 1
    M = E + E @ E
    plus: List[Tuple[Hashable, Hashable]] = []
    for i, ci in enumerate(cluster):
        for j, cj in enumerate(cluster):
            if M[i, j] > 0:
                plus.append((ci, cj))
    return plus


def is_finite(e: float) -> bool:
    return e != math.inf and not math.isnan(e)
