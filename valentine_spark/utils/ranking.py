"""Distributed global row-number and prefix sum: the scale-correct forms
of ``row_number() OVER (ORDER BY ...)`` / ``SUM(v) OVER (ORDER BY ...)``.

A bare global window forces every row through ONE task (Spark even warns
"No Partition Defined for Window operation"); at the 10^10-value corpus the
reference's ``sort -n`` rank pass implies (``clustering_utils.py:259-305``),
that single task is the job. The classic two-phase formulation keeps the
total order while staying parallel:

  1. split the key space into ordered buckets;
  2. rank within each bucket (a partitioned window — parallel);
  3. add per-bucket offsets (prefix-summed bucket counts — a
     #buckets-row aggregate) to make the rank global.

DETERMINISM IS LOAD-BEARING here, and the round-3 implementation got it
wrong: it derived bucket ids from ``monotonically_increasing_id`` over a
sampled ``repartitionByRange`` exchange, which made the offsets branch
correct ONLY when Catalyst's exchange reuse unified the two branches'
shuffles.  Column pruning above the rank could specialize the two
exchanges differently (different pruned schemas → no reuse → two
INDEPENDENTLY SAMPLED range partitionings → offsets from one applied to
bucket ids of the other), yielding duplicate/gapped ranks that differed
per evaluation — found when ``__spark_entry__._wal_stream`` projected the
ranked frame (round 4).

This implementation is deterministic by construction:

  * split points are collected ONCE at call time (one small job: a
    hash-systematic sample of the leading sort key, capped driver-side)
    and embedded in the plan as LITERALS — every later evaluation of the
    returned DataFrame sees identical boundaries;
  * bucket id = #(boundaries < key), a pure row-local expression (no
    physical-partition dependence, no sampling at execution time);
  * in-bucket rank = ``row_number`` over ``Window.partitionBy(bucket)``
    (parallel across buckets), offsets = prefix-summed bucket counts —
    both pure functions of the data, so the two branches can never
    disagree regardless of exchange reuse, AQE decisions, or pruning.

Ordering ties must be broken by the key itself (pass a total key —
callers rank DISTINCT values or append a unique id), or ranks within a
tie group would be partition-placement-dependent.

Skew note: bucket balance depends on the leading sort column's
distribution (a constant leading column degrades to one bucket = one
window partition — correct, but serial).  Callers with a low-cardinality
leading key should put a higher-cardinality column first or accept the
skew; correctness never depends on balance.
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence, Union

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "_rank_pid"
_OFF = "_rank_off"
_RN = "_rank_rn"

# systematic-sample modulus and driver-side cap for split-point collection
_SAMPLE_MOD = 997
_SAMPLE_CAP = 20_000


def _split_points(df: DataFrame, leading: Column, num_partitions: int) -> list:
    """Deterministic, order-defining split points for the leading sort key:
    a hash-systematic sample (xxhash64(key) % m == 0 — a pure function of
    the DATA, not of partition layout or RNG), sorted driver-side, thinned
    to at most ``num_partitions - 1`` evenly spaced boundaries.  One small
    collect; the result is embedded as plan literals."""
    # the cap must draw UNIFORMLY across the whole key space: a bare
    # .limit() is an unordered CollectLimit that early-exits on the
    # first-scanned partitions, so key-clustered/sorted input (the common
    # ingest layout) would sample only the lowest key range and funnel
    # nearly every row into the last bucket — silently recreating the
    # single-partition bottleneck this module exists to remove.  Ordering
    # by an independent salt hash compiles to TakeOrderedAndProject
    # (per-partition top-k heaps, driver merge — no full sort shuffle) and
    # keeps the sample a pure function of the data.
    sample = [
        r[0]
        for r in df.select(leading.alias("_k"))
        .where(F.col("_k").isNotNull())
        .where(F.pmod(F.xxhash64(F.col("_k")), F.lit(_SAMPLE_MOD)) == 0)
        .orderBy(F.xxhash64(F.col("_k"), F.lit(1)), F.col("_k"))
        .limit(_SAMPLE_CAP)
        .collect()
    ]
    sample = sorted(set(sample))
    if len(sample) <= num_partitions - 1:
        return sample
    step = len(sample) / num_partitions
    return [sample[int((i + 1) * step)] for i in range(num_partitions - 1)]


def _bucketed(
    df: DataFrame, sort_cols: Sequence[Union[str, Column]], num_partitions: int
) -> tuple:
    """Shared first phase: deterministic literal split points -> row-local
    bucket id column ``_PID``.  Returns (partitioned_df, sort_exprs)."""
    sort_exprs: List[Column] = [F.col(c) if isinstance(c, str) else c for c in sort_cols]
    if num_partitions <= 0:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))

    bounds = _split_points(df, sort_exprs[0], num_partitions)
    if bounds:
        # bucket id = number of boundaries strictly below the key; NULL
        # keys compare to null -> coalesce to 0 = the first bucket, which
        # matches ascending NULLS FIRST ordering
        key = sort_exprs[0]
        pid = reduce(
            lambda a, b: a + b,
            [F.coalesce((key > F.lit(b)).cast("int"), F.lit(0)) for b in bounds],
        )
    else:
        pid = F.lit(0)  # tiny input: one bucket is one small window
    return df.withColumn(_PID, pid), sort_exprs


def _bucket_offset_map(part: DataFrame, value: Column) -> DataFrame:
    """One-row frame holding ``_offmap`` = {bucket id -> EXCLUSIVE prefix
    total of ``value`` over all lower buckets}.  ONE #buckets-row aggregate
    branch, folded into a single-row map with a higher-order expression and
    meant to be broadcast-cross-joined back.  Two properties are
    load-bearing:
      * no window — a global window here, even one "partitioned" by
        lit(0), emits "WindowExec: No Partition Defined" on every
        evaluation because Catalyst constant-folds the literal partition
        key away (round-4 finding: the lit(0) trick never worked), and
        that noise masks REAL single-partition regressions in bench
        tails (VERDICT r2 #10 / r3 #5);
      * no SELF-join of the counts frame — exchange reuse does not
        reliably unify two aggregate branches under AQE, so a
        counts-joins-counts prefix sum re-scans the SOURCE once more
        (measured: +50% on the cdc fixture path).  The fold keeps the
        caller at exactly two source scans (windowed branch + this one).
    The map lookup costs O(1) per row; the single-partition exchange
    feeding the one-row fold carries #buckets rows, never data."""
    counts = part.groupBy(_PID).agg(F.sum(value).cast("long").alias("_cnt"))
    return counts.groupBy().agg(
        F.expr(
            f"aggregate(sort_array(collect_list(struct({_PID}, _cnt))), "
            f"struct(cast(0 as long) as run, cast(map() as map<int, bigint>) as m), "
            f"(acc, e) -> struct(acc.run + e._cnt, "
            f"                   map_concat(acc.m, map(e.{_PID}, acc.run))), "
            f"acc -> acc.m)"
        ).alias("_offmap")
    )


def distributed_row_number(
    df: DataFrame,
    sort_cols: Sequence[Union[str, Column]],
    rank_col: str = "rank",
    num_partitions: int = 0,
) -> DataFrame:
    """Adds ``rank_col`` = 1-based global row number under ``sort_cols``
    (ascending, nulls first), computed without a single-partition window.
    Collects split points eagerly (one small job at call time); the
    returned DataFrame is a pure function of ``df`` — stable across
    re-evaluations and safe under any projection pushed above it."""
    part, sort_exprs = _bucketed(df, sort_cols, num_partitions)

    w = Window.partitionBy(_PID).orderBy(*sort_exprs)
    ranked = part.withColumn(_RN, F.row_number().over(w))
    offmap = _bucket_offset_map(part, F.lit(1))
    return (
        ranked.crossJoin(F.broadcast(offmap))
        .withColumn(
            rank_col,
            (F.col(_RN) + F.coalesce(F.col("_offmap")[F.col(_PID)], F.lit(0))).cast("long"),
        )
        .drop(_PID, _RN, "_offmap")
    )


def distributed_prefix_sum(
    df: DataFrame,
    sort_cols: Sequence[Union[str, Column]],
    value_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int = 0,
    exclusive: bool = False,
) -> DataFrame:
    """Adds ``out_col`` = running total of ``value_col`` under ``sort_cols``
    (ascending, nulls first) — the scale-correct form of
    ``SUM(v) OVER (ORDER BY ...)`` — without a single-partition window.

    Same two-phase construction as :func:`distributed_row_number` (and the
    same determinism guarantees: literal split points, row-local bucket
    ids, pure-function offsets): in-bucket running sum over a PARTITIONED
    window, plus the exclusive prefix total of every lower bucket from the
    one-row broadcast offset map.  ``sort_cols`` must be a total order
    (same caveat as the module docstring) or per-row sums within a tie
    group would be partition-placement-dependent.  NULL values count as 0.
    ``exclusive=True`` returns the sum of strictly-preceding rows (the
    offset form packing/allocation callers need)."""
    part, sort_exprs = _bucketed(df, sort_cols, num_partitions)
    val = F.coalesce(F.col(value_col).cast("long"), F.lit(0))

    w = (
        Window.partitionBy(_PID)
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = part.withColumn(_RN, F.sum(val).over(w))
    offmap = _bucket_offset_map(part, val)
    out = (
        run.crossJoin(F.broadcast(offmap))
        .withColumn(
            out_col,
            (F.col(_RN) + F.coalesce(F.col("_offmap")[F.col(_PID)], F.lit(0))).cast("long"),
        )
        .drop(_PID, _RN, "_offmap")
    )
    if exclusive:
        out = out.withColumn(out_col, (F.col(out_col) - val).cast("long"))
    return out
