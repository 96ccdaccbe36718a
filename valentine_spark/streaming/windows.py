"""Watermarked windowed aggregations over the change stream — the late-data
pattern: event-time tumbling windows finalize once the watermark (max seen
op_ts minus the allowed lateness) passes the window end; later-arriving
events for a closed window are dropped, bounding state size."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_op_counts(
    stream: DataFrame,
    window_duration: str = "1 minute",
    lateness: str = "2 minutes",
) -> DataFrame:
    """Per (event-time window, op) counts with a watermark.  Append output
    mode: a window's row is emitted exactly once, when it finalizes."""
    return (
        stream.withWatermark("op_ts", lateness)
        .groupBy(F.window("op_ts", window_duration).alias("w"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
            "max_lsn",
        )
    )


def gap_sessions(
    df: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions via Spark's NATIVE ``session_window`` — works on
    both batch and streaming DataFrames (the streaming path needs a
    watermark, see ``run_gap_sessions``).  Semantically equivalent to the
    window-formulated ``operators.sessionize`` — two independent
    implementations, cross-checked in tests — but this one is the shape
    Structured Streaming can run incrementally: session state merges in the
    state store instead of a per-key sort.

    NOTE on boundary semantics: ``session_window`` extends a session while
    the NEXT event starts strictly before ``prev_ts + gap``; an event at
    exactly ``prev_ts + gap`` starts a NEW session — matching
    ``sessionize``'s ``delta > gap ? new : same`` rule... almost: at
    delta == gap, sessionize keeps the session (> is strict) while
    session_window closes it (window is half-open).  Equality therefore
    holds on data without exact-gap deltas; the cross-check test uses the
    testdata events, where microsecond timestamps make exact collisions
    measure-zero (and asserts equality, so a collision would surface)."""
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(user_col, "n_events", "session_start", "session_end", "total_value")
    )


def run_gap_sessions(
    stream: DataFrame,
    checkpoint_dir: str,
    query_name: str = "gap_sessions",
    gap: str = "30 minutes",
    lateness: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    available_now: bool = True,
):
    """Streaming sessionization: watermarked session windows finalize once
    the watermark passes the session's close (append mode — each session
    row is emitted exactly once)."""
    sessions = gap_sessions(
        stream.withWatermark(ts_col, lateness), gap, user_col, ts_col, value_col
    )
    writer = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_windowed_counts(
    stream: DataFrame,
    checkpoint_dir: str,
    query_name: str = "op_window_counts",
    window_duration: str = "1 minute",
    lateness: str = "2 minutes",
    available_now: bool = True,
):
    writer = (
        windowed_op_counts(stream, window_duration, lateness)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
