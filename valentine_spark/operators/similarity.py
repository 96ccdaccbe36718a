"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline: a crossJoin whose inner
product stays entirely in JVM expressions (``zip_with`` + ``aggregate`` over
the arrays — sequential left-to-right fold, deterministic).  The scale path
is IVF-style sign-bucketing: assign every vector to a coarse cell (sign bits
of its leading components), join queries only against their own cell —
candidate set shrinks ~2^bits-fold; recall is traded via multi-probe
(neighboring cells), not implemented here.

Scores are rounded to 6 decimals so engine-level summation-order noise
(~1e-15) can never flip a comparison against the SQL oracle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
) -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, score, rank).  Default query
    set: the first ``n_queries`` corpus vectors BY ID VALUE (``id <
    n_queries`` — requires dense 0-based ids; a sparse id space raises
    instead of silently returning nothing).  Deterministic tie-break on
    vec_id ascending."""
    default_queries = queries is None
    if default_queries:
        queries = corpus.where(F.col(id_col) < n_queries)
        if queries.isEmpty():
            raise ValueError(
                f"default query set ({id_col} < {n_queries}) matched no rows "
                "(ids are not dense 0-based) — pass queries explicitly"
            )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    # broadcast only the known-small default query set; a caller-supplied
    # frame may be arbitrarily large (same guard as kmeans.ivf_kmeans_topk)
    q_side = F.broadcast(q) if default_queries else q
    scored = (
        q_side
        .crossJoin(c)
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "score",
            F.round(_dot(F.col("q_vec"), F.col("c_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def sign_bucket(vec_col: str, bits: int = 3):
    """IVF-ish coarse cell id: sign bits of the first ``bits`` components."""
    expr = F.lit(0)
    for i in range(bits):
        expr = expr + F.when(F.element_at(F.col(vec_col), i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return expr


def ivf_topk(
    corpus: DataFrame,
    queries: Optional[DataFrame] = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_queries: int = 5,
    bits: int = 3,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bucket
    cell (equi-join on the cell id instead of a crossJoin).  Default query
    set as in ``cosine_topk`` (dense 0-based ids, raises on no match)."""
    default_queries = queries is None
    if default_queries:
        queries = corpus.where(F.col(id_col) < n_queries)
        if queries.isEmpty():
            raise ValueError(
                f"default query set ({id_col} < {n_queries}) matched no rows "
                "(ids are not dense 0-based) — pass queries explicitly"
            )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), sign_bucket(vec_col, bits).alias("cell")
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"), sign_bucket(vec_col, bits).alias("cell")
    )
    q_side = F.broadcast(q) if default_queries else q
    scored = (
        q_side
        .join(c, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn(
            "score",
            F.round(_dot(F.col("q_vec"), F.col("c_vec")) / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "score", "rank")
    )


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above threshold,
    blocked by sign-bucket cell (near-identical vectors share the cell)."""
    v = corpus.select(F.col(id_col), F.col(vec_col), sign_bucket(vec_col, bits).alias("cell"))
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cell")
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cell")
    return (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "score",
            F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6),
        )
        .where(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )
