"""Structured Streaming front-end for the CDC engine: tail a change stream
(file drop-zone, Kafka, or a rate-source synthesizer) and apply each
micro-batch through the exactly-once LWW+MERGE pipeline via ``foreachBatch``.

Exactly-once composition: Structured Streaming's checkpoint guarantees each
micro-batch is delivered with a stable ``batch_id``; ``apply_batch`` is
idempotent under that id (lake manifest check), so retries/replays after
failure commit at most once.  This is the standard foreachBatch idempotent-
sink pattern, with the idempotence implemented by the lake rather than
assumed.

The batch-mode ``replay`` (cdc/apply.py) remains the deterministic/bench
path; this module is the long-running tail.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..cdc.apply import apply_batch
from ..cdc.generator import _h, _pmod, change_op_expr, change_payload_cols
from ..cdc.lake import LakeTable

STREAM_DDL = (
    "lsn long, op_ts timestamp, op string, repo string, path string, "
    "commit string, lang string, content string"
)


def stream_from_files(
    spark: SparkSession,
    drop_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Tail a drop-zone directory of change-event files (the WAL-shipping
    pattern).  Schema is fixed -> no inference scan.

    ``max_files_per_trigger`` bounds each micro-batch (backpressure for
    catch-up over a deep backlog; also what the kill-and-restart test uses
    to force a multi-batch drain)."""
    reader = spark.readStream.schema(STREAM_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(drop_dir) if fmt == "parquet" else reader.format(fmt).load(drop_dir)


def synth_rate_stream(
    spark: SparkSession,
    rows_per_second: int = 10_000,
    n_keys: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Rate-source-backed synthetic change stream — the SAME per-event
    derivations as the batch generator (``change_op_expr`` /
    ``change_payload_cols``, one source of truth), keyed on the rate
    source's monotonic value as the lsn."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    lsn = F.col("value")
    key_id = _pmod(_h(seed ^ 6, lsn), n_keys)
    op = change_op_expr(seed, lsn)
    return rate.select(
        lsn.alias("lsn"),
        F.col("timestamp").alias("op_ts"),
        op.alias("op"),
        *change_payload_cols(seed, key_id, lsn, op),
    )


def stream_apply(
    stream: DataFrame,
    lake: LakeTable,
    checkpoint_dir: str,
    trigger_seconds: Optional[int] = None,
    matcher=None,
    n_salts: int = 1,
    available_now: bool = False,
    stream_id: str = "stream",
):
    """Start the streaming apply: every micro-batch goes through drift
    resolution + LWW + exactly-once MERGE.  Returns the StreamingQuery.

    ``available_now=True`` drains everything currently available then stops
    (the catch-up/backfill trigger).

    ``stream_id`` namespaces the lake batch ids (``{stream_id}-{n}``).
    The lake's applied-batch set is GLOBAL per table and Structured
    Streaming numbers micro-batches from 0 per checkpoint, so two queries
    writing the same lake — or one query whose checkpoint directory was
    deleted and recreated — MUST use distinct stream_ids: with a reused id,
    every replayed micro-batch number is "already applied" and its events
    are silently dropped.  Resuming from the SAME checkpoint with the same
    stream_id is the exactly-once path (replays dedupe correctly)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_batch(
            lake,
            batch_df,
            batch_id=f"{stream_id}-{batch_id}",
            matcher=matcher,
            n_salts=n_salts,
        )

    writer = stream.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def stream_route(
    raw_stream: DataFrame,
    tables,
    schemas,
    checkpoint_dir: str,
    json_col: str = "value",
    dlq_dir: Optional[str] = None,
    trigger_seconds: Optional[int] = None,
    available_now: bool = False,
    parallelism: int = 1,
    stream_id: str = "route",
    decoder=None,
    skip_empty: bool = True,
    **apply_kw,
):
    """Streaming multi-table WAL ingest: tail a raw envelope stream
    (file drop-zone of JSON lines, Kafka value column, ...) and fan each
    micro-batch out to N lake tables via the router (cdc/router.py).

    ``decoder``: :func:`~valentine_spark.cdc.router.decode_maxwell_routed`
    by default; pass :func:`~valentine_spark.cdc.router.decode_debezium_routed`
    to tail a Debezium-shaped single stream — same pluggability as the
    batch :func:`~valentine_spark.cdc.router.replay_routed`.

    Exactly-once composition is the same as :func:`stream_apply`, per
    table: Structured Streaming replays micro-batches under stable ids,
    and every table commits under ``{stream_id}-{batch_id}/{table}`` — a
    replayed micro-batch skips exactly the tables that already committed,
    finishing any crash-interrupted fan-out.  The ``stream_id`` caveats of
    :func:`stream_apply` apply unchanged.

    ``dlq_dir``: when set, each micro-batch OVERWRITES its dead letters to
    ``{dlq_dir}/batch-{batch_id}`` — overwrite, not append, so replayed
    micro-batches leave the quarantine exactly-once too.

    ``skip_empty`` (default on): ONE schema-pruned shell-parse pass per
    micro-batch (:func:`~valentine_spark.cdc.router.shell_table_counts`)
    finds which tables the batch actually touches, and only those decode
    and commit — with 10^3 registered tables and a typical batch touching
    a handful, this removes ~10^3 per-table decode passes and commit
    floors per poll.  Consequence: an untouched table's watermark does not
    advance through the micro-batch, so a batch-mode
    :func:`~valentine_spark.cdc.apply.resume_replay` over the same range
    re-scans from that table's older watermark — correct (the skipped
    batches held none of its events), just a wider re-read window.  Set
    False to restore a (possibly empty) commit per table per micro-batch.
    With a CUSTOM ``decoder`` (neither Maxwell nor Debezium) the probe's
    dialect is unknown, so every table is treated as occupied.  Tables
    that change rarely belong on a slower tail either way (see
    docs/OPERATIONS.md, multi-table ingest).

    Delivery-order contract: cross-batch precedence is application order,
    so the SOURCE must deliver events in WAL order across micro-batches
    (Kafka partitions do within a key's partition; a file drop-zone must
    ship files with monotonically increasing modification times — Spark's
    file source orders pending files by mtime, and equal mtimes make
    batch order arbitrary)."""
    from ..cdc.router import (
        apply_routed,
        decode_debezium_routed,
        decode_maxwell_routed,
        shell_table_counts,
    )

    decode = decoder or decode_maxwell_routed
    dialect = {
        decode_maxwell_routed: "maxwell",
        decode_debezium_routed: "debezium",
    }.get(decode)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        routed = decode(batch_df, schemas, json_col=json_col)
        if dlq_dir is not None:
            routed.dead_letters.write.mode("overwrite").parquet(
                f"{dlq_dir}/batch-{batch_id}"
            )
        streams = routed.streams
        if skip_empty and dialect is not None:
            counts = shell_table_counts(
                batch_df, schemas, json_col=json_col, dialect=dialect
            )
            streams = {n: df for n, df in streams.items() if counts.get(n)}
            if not streams:
                return
        apply_routed(
            tables,
            streams,
            f"{stream_id}-{batch_id}",
            parallelism=parallelism,
            **apply_kw,
        )

    writer = raw_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
