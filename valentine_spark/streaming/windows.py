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
