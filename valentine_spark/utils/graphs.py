"""Minimal graph structures for the driver-side matcher algorithms.

Schema graphs are O(#columns) — far below any scale where a distributed graph
engine pays off (SURVEY.md G1-G9) — so these are plain-Python adjacency maps.
Replaces the reference's networkx dependency.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Hashable, Iterable, List, Set, Tuple


def connected_components(nodes: Iterable[Hashable], edges: Iterable[Tuple[Hashable, Hashable]]) -> List[Set[Hashable]]:
    """Union-find connected components; component order follows first-seen
    node order (insertion-ordered, deterministic)."""
    parent: Dict[Hashable, Hashable] = {}
    order: List[Hashable] = []

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def add(x):
        if x not in parent:
            parent[x] = x
            order.append(x)

    for n in nodes:
        add(n)
    for a, b in edges:
        add(a)
        add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    groups: Dict[Hashable, Set[Hashable]] = defaultdict(set)
    for n in order:
        groups[find(n)].add(n)
    seen_roots = dict.fromkeys(find(n) for n in order)  # first-seen order
    return [groups[root] for root in seen_roots]


class DiGraph:
    """Directed multigraph-lite: one edge per (u, v) with attribute dict."""

    def __init__(self):
        self._succ: Dict[Hashable, Dict[Hashable, dict]] = {}
        self._pred: Dict[Hashable, Dict[Hashable, dict]] = {}

    def add_node(self, n) -> None:
        self._succ.setdefault(n, {})
        self._pred.setdefault(n, {})

    def add_edge(self, u, v, **attrs) -> None:
        self.add_node(u)
        self.add_node(v)
        self._succ[u][v] = attrs
        self._pred[v][u] = attrs

    def nodes(self):
        return list(self._succ.keys())

    def has_node(self, n) -> bool:
        return n in self._succ

    def edges(self):
        return [(u, v) for u, nbrs in self._succ.items() for v in nbrs]

    def out_edges(self, n):
        return [(n, v) for v in self._succ.get(n, {})]

    def in_edges(self, n):
        return [(u, n) for u in self._pred.get(n, {})]

    def get_edge_data(self, u, v) -> dict:
        return self._succ.get(u, {}).get(v, {})

    def predecessors(self, n):
        return list(self._pred.get(n, {}))
