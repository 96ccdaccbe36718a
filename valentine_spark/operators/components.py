"""Distributed connected components — duplicate-group resolution at scale.

Near-dup detection (minhash/simhash/ngram pairs) yields EDGES; deduplication
needs GROUPS (every doc labeled with one canonical representative, even
through chains a-b, b-c).  The reference resolves its column-graph
components on the driver with NetworkX (``discovery.py:47-51`` — right for
O(|cols|²) graphs); document graphs are data-sized, so this is the
distributed form:

  * min-label propagation WITH pointer jumping: every node starts labeled
    with itself; each round, label(v) = min(label(v), min over neighbors'
    labels, label(label(v))).  The label(label(v)) hop is path compression
    (the "small-star" move of Kiveris et al.'s MapReduce CC): labels chase
    their own label's label, so chains collapse in O(log diameter) rounds
    instead of O(diameter) — a 10^6-node path needs ~20 rounds, not 10^6.
  * each round is TWO joins (labels to edges, labels to labels) + ONE
    aggregation — shuffle on node id each time, the same key each round, so
    AQE/exchange reuse keeps the plan tight; ``localCheckpoint`` truncates
    the iterative lineage (SURVEY.md §4: fixpoint loops need explicit
    lineage cuts).
  * convergence is checked with a count of changed labels (one small action
    per round); hitting max_iter without a fixpoint RAISES — a silent
    non-converged exit would return wrong component labels.

Output: (node, component) where component = min node id reachable — the
canonical-representative convention of ``exact_duplicates``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component is
    the minimum node id of its connected component."""
    # the symmetric edge list is re-joined every round; cut its lineage once
    # (like labels below) or each round's job re-runs the union+distinct —
    # a full shuffle of the entire edge set per iteration (shuffle reuse
    # does not apply across the separate jobs the loop's checkpoints run)
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("component").alias("nbr_min"))
            .withColumnRenamed("u", "node")
        )
        # pointer jump: component -> label(component).  component <= node by
        # construction, so this only ever shrinks labels (path compression).
        grand = labels.select(
            F.col("node").alias("component"), F.col("component").alias("_gp")
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .join(grand, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_min"), F.col("component")),
                    F.coalesce(F.col("_gp"), F.col("component")),
                ).alias("component"),
                (
                    (F.col("nbr_min") < F.col("component"))
                    | (F.col("_gp") < F.col("component"))
                ).alias("_changed"),
            )
        ).localCheckpoint()
        changed = updated.where(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"({changed} labels still changing); raise max_iter — with pointer "
        f"jumping the required rounds grow only logarithmically in diameter"
    )


def duplicate_groups(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Every document labeled with its duplicate-group canonical id
    (min doc id of its near-dup component; singletons map to themselves)."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        df.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
        )
    )
