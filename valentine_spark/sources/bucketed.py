"""Bucketed tables: shuffle-free co-located joins (the brief's "bucketing
for co-located joins" scale lever, SURVEY.md §1.2/§4).

A fact table that is repeatedly joined on the same key (orders x lineitem
on orderkey, events x users on user_id, CDC winners x lake bucket on key)
pays one hash-exchange per join per query.  Writing both sides bucketed on
the join key with the SAME bucket count pre-partitions the data ON DISK, so
Spark's SortMergeJoin consumes both sides without ANY Exchange: at 100 TB
the exchange is the dominant cost, and bucketing amortizes it into the
one-time write.

This uses Spark's native bucketed-table support (``bucketBy`` +
``saveAsTable`` — bucket metadata lives in the session catalog; plain
``.parquet()`` paths cannot carry bucket info).  ``assert_no_shuffle_join``
is the plan-level proof, used by tests and available to users auditing
their own join plans.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: List[str],
    n_buckets: int = 16,
    sort_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.
    Sorting within buckets additionally removes the per-task Sort before a
    SortMergeJoin."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: List[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key — planned
    WITHOUT a shuffle when both were written with the same n_buckets on
    the join columns."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains any shuffle Exchange (broadcast
    exchanges do not count — they are not data-sized shuffles)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    # shuffle nodes print as "Exchange hashpartitioning(...)"; broadcast
    # nodes as "BroadcastExchange" — the lookbehind excludes the latter
    return bool(re.search(r"(?<![A-Za-z])Exchange", plan))


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the join plan shuffles — the co-location proof."""
    if plan_has_exchange(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        raise AssertionError(f"expected a shuffle-free co-bucketed join, got:\n{plan}")
