"""Windowed/ordered operators over event streams: last-writer-wins snapshots,
gap-based sessionization, top-k.  These are the query-shaped counterparts of
the CDC engine's internals (the engine itself uses the salted max_by variant —
valentine_spark.cdc.apply)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def latest_event_per_user(df: DataFrame) -> DataFrame:
    """LWW snapshot of the events table: one row per user_id, the event with
    max (ts, event_id).

    DELIBERATELY window-formulated (not max_by): it is the SQL-oracle shape,
    and Catalyst's WindowGroupLimit rewrite makes it measured-equivalent to
    the agg form (BENCH/BASELINE.md §2).  The CDC engine's internal sibling
    is ``cdc.apply.lww_dedup_window`` — keep their ordering/tie-break
    semantics in sync (and the SQL oracles) if either changes."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds the gap.  Returns per-session aggregates."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    with_flag = df.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            # sub-second-exact gap: timestamp subtraction yields a day-time
            # interval at microsecond precision, where unix_timestamp() would
            # truncate to whole seconds and misjudge event pairs straddling
            # the gap boundary by <1 s (DuckDB's epoch(ts) is fractional, so
            # the oracle compares full precision); intervals also work for
            # TIMESTAMP_NTZ, which refuses a double cast
            | (F.col("ts") - F.lag("ts").over(w) > F.make_dt_interval(secs=F.lit(gap_s))),
            1,
        ).otherwise(0),
    )
    with_id = with_flag.withColumn("session_seq", F.sum("new_session").over(w))
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def topk_by(df: DataFrame, order_col: str, k: int, tiebreak_col: str) -> DataFrame:
    """Global top-k with deterministic tie-break — compiles to
    TakeOrderedAndProject (no full sort materialization)."""
    return df.orderBy(F.col(order_col).desc(), F.col(tiebreak_col)).limit(k)
