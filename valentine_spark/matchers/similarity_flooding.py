"""Similarity Flooding matcher (Melnik et al., ICDE 2002).

Schema-only: operates on table/column names and lattice data types, never on
instance data — so the whole algorithm is a driver-side fixpoint over a graph
of O(#columns) nodes (SURVEY.md G1-G4; distributing it would only add shuffle
overhead).  Reference semantics mirrored from
``/root/reference/valentine/algorithms/similarity_flooding/``:

  * OIM schema graph: literal nodes Table/Column/ColumnType; one "NodeID-k"
    node per table/column/datatype with 'name'/'type'/'column'/'SQLtype'
    labeled edges (graph.py:8-74);
  * initial similarity = normalized Levenshtein of node names; NodeID pairs
    start at 0 (similarity_flooding.py:38-47);
  * pairwise connectivity graph over equal edge labels; propagation
    coefficients via 'inverse_product' (1/label-count) or 'inverse_average'
    (2/summed label-count) (propagation_graph.py:17-176);
  * fixpoint (<=100 iters, L2 residual <= 1e-4) with formulas
    basic/a/b/c, max-normalized each round (similarity_flooding.py:57-163);
  * output: NodeID pairs whose both members are Column-typed, similarity
    sorted descending (similarity_flooding.py:165-231).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame

from ..functions.string_distance import levenshtein_scalar
from ..results import Match, MatchKey
from ..types import lattice_types
from ..utils.graphs import DiGraph

TABLE, COLUMN, COLUMN_TYPE = "Table", "Column", "ColumnType"


@dataclass(frozen=True)
class _Node:
    name: str
    db: str
    long_name: Optional[tuple] = field(default=None, compare=False, hash=False)

    @property
    def is_oid(self) -> bool:
        return self.name.startswith("NodeID")


_Pair = Tuple[_Node, _Node]


def _name_sim(a: str, b: str) -> float:
    return 1.0 - levenshtein_scalar(a, b) / max(max(len(a), len(b)), 1)


def _build_schema_graph(table_name: str, guid: str, columns: Dict[str, str]) -> DiGraph:
    """columns: ordered {column_name: lattice_type}."""
    g = DiGraph()
    table_lit = _Node(TABLE, table_name)
    column_lit = _Node(COLUMN, table_name)
    coltype_lit = _Node(COLUMN_TYPE, table_name)
    for lit in (table_lit, column_lit, coltype_lit):
        g.add_node(lit)

    uid = 1
    tbl = _Node(f"NodeID{uid}", table_name)
    g.add_node(tbl)
    g.add_edge(tbl, _Node(table_name, table_name), label="name")
    g.add_edge(tbl, table_lit, label="type")

    type_oid: Dict[str, _Node] = {}
    for col_name, dtype in columns.items():
        uid += 1
        long_name = (table_name, guid, col_name, f"{guid}:{col_name}")
        col_oid = _Node(f"NodeID{uid}", table_name, long_name)
        g.add_node(col_oid)
        g.add_edge(col_oid, column_lit, label="type")
        g.add_edge(tbl, col_oid, label="column")
        g.add_edge(col_oid, _Node(col_name, table_name, long_name), label="name")
        if dtype in type_oid:
            g.add_edge(col_oid, type_oid[dtype], label="SQLtype")
        else:
            uid += 1
            t_oid = _Node(f"NodeID{uid}", table_name, long_name)
            g.add_node(t_oid)
            g.add_edge(t_oid, coltype_lit, label="type")
            g.add_edge(t_oid, _Node(dtype, table_name, long_name), label="name")
            g.add_edge(col_oid, t_oid, label="SQLtype")
            type_oid[dtype] = t_oid
    return g


def _connectivity_graph(g1: DiGraph, g2: DiGraph) -> DiGraph:
    cg = DiGraph()
    for u1, v1 in g1.edges():
        l1 = g1.get_edge_data(u1, v1).get("label")
        for u2, v2 in g2.edges():
            if l1 == g2.get_edge_data(u2, v2).get("label"):
                cg.add_edge((u1, u2), (v1, v2), label=l1)
    return cg


def _label_counts(edges, graph: DiGraph) -> Dict[str, float]:
    counts: Dict[str, float] = {}
    for u, v in edges:
        label = graph.get_edge_data(u, v).get("label")
        counts[label] = counts.get(label, 0.0) + 1.0
    return counts


def _propagation_graph(g1: DiGraph, g2: DiGraph, cg: DiGraph, policy: str) -> DiGraph:
    pg = DiGraph()
    for n in cg.nodes():
        pg.add_node(n)

    if policy == "inverse_product":
        for n in pg.nodes():
            in_counts = _label_counts(cg.in_edges(n), cg)
            for u, v in cg.in_edges(n):
                label = cg.get_edge_data(u, v).get("label")
                pg.add_edge(v, u, weight=1.0 / in_counts[label])
            out_counts = _label_counts(cg.out_edges(n), cg)
            for u, v in cg.out_edges(n):
                label = cg.get_edge_data(u, v).get("label")
                pg.add_edge(u, v, weight=1.0 / out_counts[label])
        return pg

    if policy != "inverse_average":
        raise ValueError(f"unknown coefficient policy: {policy}")

    for n in pg.nodes():
        n1, n2 = n
        ga, gb = (g1, g2) if g1.has_node(n1) else (g2, g1)
        in_counts = _label_counts(ga.in_edges(n1), ga)
        for label, cnt in _label_counts(gb.in_edges(n2), gb).items():
            in_counts[label] = in_counts.get(label, 0.0) + cnt
        out_counts = _label_counts(ga.out_edges(n1), ga)
        for label, cnt in _label_counts(gb.out_edges(n2), gb).items():
            out_counts[label] = out_counts.get(label, 0.0) + cnt

        for u, v in cg.in_edges(n):
            label = cg.get_edge_data(u, v).get("label")
            pg.add_edge(v, u, weight=2.0 / in_counts[label])
        for u, v in cg.out_edges(n):
            label = cg.get_edge_data(u, v).get("label")
            pg.add_edge(u, v, weight=2.0 / out_counts[label])
    return pg


from . import BaseMatcher


class SimilarityFlooding(BaseMatcher):
    def __init__(self, coeff_policy: str = "inverse_average", formula: str = "formula_c"):
        self.coeff_policy = coeff_policy
        self.formula = formula

    def get_matches(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ) -> Dict[MatchKey, float]:
        g1 = _build_schema_graph(source_name, source_name, lattice_types(source))
        g2 = _build_schema_graph(target_name, target_name, lattice_types(target))

        initial: Dict[_Pair, float] = {}
        for n1 in g1.nodes():
            for n2 in g2.nodes():
                if n1.is_oid or n2.is_oid:
                    initial[(n1, n2)] = 0.0
                else:
                    initial[(n1, n2)] = _name_sim(n1.name, n2.name)

        cg = _connectivity_graph(g1, g2)
        pg = _propagation_graph(g1, g2, cg, self.coeff_policy)
        final = self._fixpoint(initial, pg, num_iter=100, residual_diff=1e-4)

        matches: Dict[MatchKey, float] = {}
        for (n1, n2), sim in sorted(final.items(), key=lambda kv: -kv[1]):
            if not (self._is_column_oid(n1, g1, g2) and self._is_column_oid(n2, g1, g2)):
                continue
            s_ln = self._named_long_name(n1, g1, g2)
            t_ln = self._named_long_name(n2, g1, g2)
            if s_ln is None or t_ln is None:
                continue
            matches.update(
                Match(t_ln[0], t_ln[2], s_ln[0], s_ln[2], float(sim)).to_dict
            )
        return matches

    # ------------------------------------------------------------------

    @staticmethod
    def _is_column_oid(node: _Node, g1: DiGraph, g2: DiGraph) -> bool:
        if not node.is_oid:
            return False
        g = g1 if g1.has_node(node) else g2
        return any(v.name == COLUMN for _, v in g.out_edges(node))

    @staticmethod
    def _named_long_name(node: _Node, g1: DiGraph, g2: DiGraph):
        g = g1 if g1.has_node(node) else g2
        for _, v in g.out_edges(node):
            if g.get_edge_data(node, v).get("label") == "name":
                return v.long_name
        return None

    def _step(self, prev: Dict[_Pair, float], initial: Dict[_Pair, float], pg: DiGraph, formula: str) -> Dict[_Pair, float]:
        nxt: Dict[_Pair, float] = {}
        max_sim = 0.0
        for n in pg.nodes():
            if formula == "formula_a":
                s = initial[n]
            elif formula == "formula_b":
                s = 0.0
            else:  # basic / formula_c accumulate onto previous
                s = prev[n]
            for u, _ in pg.in_edges(n):
                w = pg.get_edge_data(u, n).get("weight")
                if formula in ("formula_a", "basic"):
                    s += w * prev[u]
                elif formula == "formula_b":
                    s += w * initial[u]
                else:  # formula_c
                    s += initial[u] + w * (prev[u] + initial[u])
            max_sim = max(max_sim, s)
            nxt[n] = s
        if max_sim > 0:
            nxt = {k: v / max_sim for k, v in nxt.items()}
        return nxt

    def _fixpoint(self, initial: Dict[_Pair, float], pg: DiGraph, num_iter: int, residual_diff: float) -> Dict[_Pair, float]:
        def residual(a: Dict[_Pair, float], b: Dict[_Pair, float]) -> float:
            keys = set(a) | set(b)
            return math.sqrt(sum((a.get(k, 0.0) - b.get(k, 0.0)) ** 2 for k in keys))

        formula = self.formula
        if formula not in ("basic", "formula_a", "formula_b", "formula_c"):
            raise ValueError(f"unknown formula: {formula}")

        prev = dict(initial)
        iters = num_iter
        if formula == "formula_b":
            prev = self._step(None, initial, pg, "formula_b")
            iters = num_iter - 1
        elif formula == "formula_c":
            prev = self._step(dict(initial), initial, pg, "formula_b")
            iters = num_iter - 1

        for _ in range(iters):
            nxt = self._step(prev, initial, pg, formula)
            if residual(prev, nxt) <= residual_diff:
                break
            prev = nxt
        return prev
