"""Watermarked windowed aggregations over the change stream — the late-data
pattern: event-time tumbling windows finalize once the watermark (max seen
op_ts minus the allowed lateness) passes the window end; later-arriving
events for a closed window are dropped, bounding state size."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F


def _append_writer(
    out: DataFrame, checkpoint_dir: str, query_name: str,
    available_now: bool, sink_path: Optional[str],
):
    """Shared sink wiring for the runners below.  ``sink_path=None`` uses
    the in-memory sink for interactive inspection via
    ``spark.table(query_name)`` — NOTE: the memory sink cannot recover
    from an existing checkpoint (Spark refuses at start), so it only
    serves single-run use; a periodic drain loop re-invoking the runner
    against the same checkpoint dir must pass ``sink_path`` (restartable
    parquet append — append mode emits each finalized row exactly once,
    so the sink is the cumulative result)."""
    if sink_path is None:
        writer = (
            out.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
        )
    else:
        writer = (
            out.writeStream.format("parquet")
            .option("path", sink_path)
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
    sink_path: Optional[str] = None,
):
    """Streaming sessionization: watermarked session windows finalize once
    the watermark passes the session's close (append mode — each session
    row is emitted exactly once).  See ``_append_writer`` for the
    memory-vs-parquet sink contract (re-running against the same
    checkpoint requires ``sink_path``)."""
    sessions = gap_sessions(
        stream.withWatermark(ts_col, lateness), gap, user_col, ts_col, value_col
    )
    return _append_writer(sessions, checkpoint_dir, query_name, available_now, sink_path)


def run_windowed_counts(
    stream: DataFrame,
    checkpoint_dir: str,
    query_name: str = "op_window_counts",
    window_duration: str = "1 minute",
    lateness: str = "2 minutes",
    available_now: bool = True,
    sink_path: Optional[str] = None,
):
    """Windowed op counts; sink contract as in ``_append_writer``."""
    return _append_writer(
        windowed_op_counts(stream, window_duration, lateness),
        checkpoint_dir, query_name, available_now, sink_path,
    )
