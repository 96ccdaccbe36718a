"""CDC / incremental-ingest engine (the BASELINE.json north star):
binlog/WAL-style change-stream replay -> key-partitioned MERGE upserts into an
Iceberg-style lake table, exactly-once, resumable, skew-salted, with
Valentine-matcher schema evolution."""

from .apply import (
    apply_batch,
    batch_watermarks,
    bootstrap_snapshot,
    lww_dedup,
    lww_dedup_window,
    oracle_replay,
    replay,
    resume_replay,
    snapshot_then_stream,
)
from .drift import resolve_drift
from .follow import (
    ChangelogFollower,
    Delivery,
    SnapshotExpiredError,
    apply_delivery,
    mirror_changes,
)
from .incremental_dedup import MinHashLshIndex
from .ivm import aggregate_delta, init_aggregate, maintain_aggregate
from .generator import KEY_COLS, PAYLOAD_COLS, STREAM_COLS, synth_base_table, synth_change_stream
from .lake import BucketLayoutChangedError, CommitConflictError, LakeTable, bucket_expr
from .merge_into import MergeCardinalityError, MergeIntoBuilder
from .router import (
    RoutedStream,
    apply_routed,
    decode_debezium_routed,
    decode_maxwell_routed,
    replay_routed,
)
from .wal import (
    DecodedStream,
    debezium_envelope_schema,
    decode_debezium,
    decode_maxwell,
    maxwell_envelope_schema,
    maxwell_position_lsn,
)

__all__ = [
    "LakeTable",
    "BucketLayoutChangedError",
    "CommitConflictError",
    "MergeIntoBuilder",
    "MergeCardinalityError",
    "bucket_expr",
    "apply_batch",
    "replay",
    "resume_replay",
    "bootstrap_snapshot",
    "snapshot_then_stream",
    "lww_dedup",
    "lww_dedup_window",
    "batch_watermarks",
    "oracle_replay",
    "resolve_drift",
    "ChangelogFollower",
    "Delivery",
    "SnapshotExpiredError",
    "apply_delivery",
    "mirror_changes",
    "aggregate_delta",
    "init_aggregate",
    "maintain_aggregate",
    "MinHashLshIndex",
    "synth_base_table",
    "synth_change_stream",
    "KEY_COLS",
    "PAYLOAD_COLS",
    "STREAM_COLS",
    "DecodedStream",
    "RoutedStream",
    "decode_debezium",
    "decode_maxwell",
    "decode_maxwell_routed",
    "decode_debezium_routed",
    "apply_routed",
    "replay_routed",
    "debezium_envelope_schema",
    "maxwell_envelope_schema",
    "maxwell_position_lsn",
]


def demo_replay(n_events: int = 20_000, n_keys: int = 2_000, tmpdir: str | None = None):
    """Small end-to-end demo used by the verify recipe: generate a stream,
    replay it, print the state checksum."""
    import tempfile

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    root = tmpdir or tempfile.mkdtemp(prefix="lake_demo_")
    lake = LakeTable.create(f"{root}/repo_files", spark, n_buckets=8)
    stream = synth_change_stream(spark, n_events, n_keys)
    commits = replay(lake, stream, batch_lsns=n_events // 4)
    print("commits:", [c.get("version") for c in commits])
    print("state:", lake.state_checksum())
    return lake
