"""Deterministic corpus sampling: train/val/test hash splits and
mixture-weighted resampling (per-source "epoch" replication).

Both operators are pure row-local column expressions — ZERO shuffles, no
RNG, no UDFs — so at 100 TB they are map jobs, and re-running them on any
partitioning (or a different engine) reproduces the same assignment
bit-for-bit.  Randomness comes from an md5-derived uniform (the repo's
established cross-engine hash: Spark ``conv(substring(md5(x),1,8),16,10)``
== DuckDB ``CAST('0x' || substr(md5(x),1,8) AS BIGINT)``), keyed by the
document id plus a salt, so

  * assignments are stable under corpus growth (a doc's split never
    changes when other docs are added — unlike rank-based splitting);
  * independent decisions use independent salts (split vs resample);
  * an ANSI-SQL oracle replays every decision exactly.

Cut points and weights are embedded as Python-computed double LITERALS in
the plan, so Spark and the SQL oracle compare against identical IEEE
values.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame, functions as F

_U32 = 4294967296.0  # 2^32: md5's leading 8 hex chars normalized to [0,1)


def hash_uniform(col: Column, salt: str) -> Column:
    """Deterministic uniform in [0,1): leading 32 bits of
    ``md5(value ':' salt)`` over 2^32.  NULL input -> NULL."""
    digest = F.md5(F.concat(col.cast("string"), F.lit(":" + salt)))
    return (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") / F.lit(_U32)
    ).cast("double")


def hash_uniform_sql(expr: str, salt: str) -> str:
    """The DuckDB spelling of :func:`hash_uniform` (same bits, same double)."""
    return (
        f"(CAST('0x' || substr(md5({expr} || ':{salt}'), 1, 8) AS BIGINT)"
        f" / {_U32!r})"
    )


def _cut_points(weights: Dict[str, float]) -> List[Tuple[str, float]]:
    """(name, cumulative_fraction) pairs in insertion order; fractions are
    normalized by the total so weights need not sum to 1.  Computed ONCE in
    Python and embedded as literals — the Spark plan and the SQL oracle
    must compare u against bit-identical doubles."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive total")
    cuts, run = [], 0.0
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for split {name!r}: {w}")
        run += float(w) / total
        cuts.append((name, run))
    return cuts


def corpus_split(
    df: DataFrame,
    weights: Dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a named split (default 98/1/1 train/val/test) by
    hashing ``id_col`` — the standard held-out-set construction for a
    pretraining corpus.  Hash-keyed (NOT rank- or position-keyed), so a
    document keeps its split forever as the corpus grows, across engines
    and partitionings; different ``salt`` values give independent splits.
    The last split absorbs rows with NULL ids (NULL uniform falls through
    every cut).  Zero-shuffle: one row-local expression."""
    cuts = _cut_points(weights or {"train": 0.98, "val": 0.01, "test": 0.01})
    u = hash_uniform(F.col(id_col), salt)
    expr = F.lit(cuts[-1][0])  # last split = ELSE branch (also catches NULL)
    for name, cut in reversed(cuts[:-1]):
        expr = F.when(u < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def corpus_split_sql_case(
    weights: Dict[str, float] | None = None, id_expr: str = "doc_id", salt: str = "split"
) -> str:
    """The oracle CASE expression matching :func:`corpus_split` exactly
    (same cut literals, same ELSE-absorbs-NULL semantics)."""
    cuts = _cut_points(weights or {"train": 0.98, "val": 0.01, "test": 0.01})
    u = hash_uniform_sql(f"{id_expr}::VARCHAR", salt)
    whens = "".join(
        f" WHEN {u} < {cut!r} THEN '{name}'" for name, cut in cuts[:-1]
    )
    return f"CASE{whens} ELSE '{cuts[-1][0]}' END"


def mixture_resample(
    df: DataFrame,
    weights: Dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Mixture-weighted deterministic replication: a row whose source has
    weight ``w`` appears ``floor(w) + [u < frac(w)]`` times (``copy_col`` =
    1..n), so every source's expected — and, per hash determinism, actual
    long-run — multiplicity is exactly ``w``.  This is how a training run
    hits a target domain mixture (up-weight curated sources past 1 epoch,
    down-sample bulk web below 1) without RNG state or a shuffle: the
    decision is a pure function of (id, salt), replayable by the SQL
    oracle.  Sources ABSENT from ``weights`` get weight 0 — their rows are
    dropped (pass an explicit 1.0 to keep a source as-is); rows whose copy
    count is 0 vanish.  Zero-shuffle: row-local arithmetic + an in-row
    ``sequence`` explode."""
    if not weights:
        raise ValueError("weights must name at least one source")
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"negative weight for source {k!r}: {v}")
    pairs: List[Column] = []
    for k, v in weights.items():
        pairs.extend([F.lit(k), F.lit(float(v))])
    w = F.coalesce(
        F.create_map(*pairs)[F.col(source_col)], F.lit(0.0)
    )
    u = hash_uniform(F.col(id_col), salt)
    n = (F.floor(w) + (u < (w - F.floor(w))).cast("int")).cast("int")
    out = df.withColumn("_n_copies", n).where(F.col("_n_copies") >= 1)
    return (
        out.withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def corpus_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle",
    rank_col: str = "shuffle_rank",
    num_partitions: int = 0,
) -> DataFrame:
    """Deterministic global corpus shuffle: ``rank_col`` = 1..n position of
    each row under the md5-uniform order (ties broken by ``id_col``) — the
    pretraining step that de-clusters a crawl corpus (by domain, date,
    shard) before sequence packing, without RNG state.  The per-document
    KEY ``(u, id)`` is a pure function of (id, salt): stable across
    engines, partitionings, and re-runs; a different ``salt`` is an
    independent permutation (epoch reshuffles).  The RANK is relative, so
    it shifts when the corpus grows — use the rank for one materialized
    layout, the key for anything that must survive growth.

    Plan shape: the rank is :func:`~valentine_spark.utils.ranking.
    distributed_row_number` (two-phase, range-bucketed, NO
    single-partition window), so at 100 TB this is one sample pass + one
    range exchange.  Composes directly with
    :func:`~valentine_spark.operators.text.pack_sequences`
    (``id_col=rank_col``): shuffle-then-pack is the standard training
    layout pipeline, and the rank is unique by construction."""
    from ..utils.ranking import distributed_row_number

    u = hash_uniform(F.col(id_col), salt)
    return distributed_row_number(
        df.withColumn("_shuffle_u", u),
        ["_shuffle_u", id_col],
        rank_col=rank_col,
        num_partitions=num_partitions,
    ).drop("_shuffle_u")


def corpus_shuffle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    salt: str = "shuffle",
    rank_col: str = "shuffle_rank",
    select: str = "*",
) -> str:
    """Oracle replaying :func:`corpus_shuffle` on ``table``: the same
    md5-uniform (bit-identical double), ranked by a window function —
    correct at oracle scale, single-partition at real scale (which is
    exactly why the Spark side uses the two-phase rank instead)."""
    u = hash_uniform_sql(f"{id_col}::VARCHAR", salt)
    return (
        f"SELECT {select}, row_number() OVER (ORDER BY {u}, {id_col})"
        f"::BIGINT AS {rank_col} FROM {table}"
    )


def mixture_resample_sql(
    weights: Dict[str, float],
    table: str = "documents",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
    copy_col: str = "copy_id",
    select: str = "* EXCLUDE (_n)",
) -> str:
    """Oracle query replaying :func:`mixture_resample` on ``table``:
    identical weight/cut literals, ``generate_series`` for the explode."""
    u = hash_uniform_sql(f"{id_col}::VARCHAR", salt)
    whens = "".join(
        f" WHEN '{k}' THEN {float(v)!r}" for k, v in weights.items()
    )
    w = f"(CASE {source_col}{whens} ELSE 0.0 END)"
    n = f"(floor({w}) + CASE WHEN {u} < {w} - floor({w}) THEN 1 ELSE 0 END)::INT"
    return (
        f"SELECT {select}, c::INT AS {copy_col} "
        f"FROM (SELECT *, {n} AS _n FROM {table}) t, "
        f"UNNEST(generate_series(1, _n)) AS g(c) "
    )
