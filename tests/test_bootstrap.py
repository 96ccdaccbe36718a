"""Snapshot-then-stream handoff (cdc/apply.py bootstrap_snapshot /
snapshot_then_stream): a consistent snapshot at LSN L fences every bucket's
watermark at L, so an overlapping tail converges to the same state as a
from-zero replay.

Covers: overlap fencing (tail starts at 0), deleted-before-snapshot keys
staying dead, exactly-once re-runs, the reserved-column guard, and the
tie at lsn == L (snapshot wins, matching "snapshot taken at L includes
event L").
"""

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import (
    LakeTable,
    bootstrap_snapshot,
    lww_dedup,
    replay,
    resume_replay,
    snapshot_then_stream,
    synth_change_stream,
)

PAYLOAD = ["repo", "path", "commit", "lang", "content"]


def _snapshot_at(stream, lsn):
    """The consistent source image as of lsn (what a snapshotting
    connector would read): LWW winners minus deletes, payload only."""
    return (
        lww_dedup(stream.where(F.col("lsn") <= lsn))
        .where(F.col("op") != "delete")
        .select(*PAYLOAD)
    )


@pytest.fixture(scope="module")
def stream(spark):
    # seed 42: produces >=1 key whose last pre-half event is a delete and
    # which never reappears in the tail (the resurrect-guard test needs one)
    return synth_change_stream(spark, 8000, 900, seed=42).cache()


def test_handoff_with_full_overlap_matches_from_zero_replay(spark, tmp_path, stream):
    half = 4000
    full = LakeTable.create(str(tmp_path / "full"), spark, n_buckets=8)
    replay(full, stream, batch_lsns=3000)

    boot = LakeTable.create(str(tmp_path / "boot"), spark, n_buckets=8)
    b, commits = snapshot_then_stream(
        boot, _snapshot_at(stream, half), half,
        stream,  # the ENTIRE stream from lsn 1 — maximal overlap
        batch_lsns=3000,
    )
    assert not b.get("skipped") and commits
    assert boot.state_checksum() == full.state_checksum()
    # fenced: every bucket watermark started at half, ended at stream top
    assert min(boot.watermarks().values()) >= half


def test_deleted_before_snapshot_stays_dead(spark, tmp_path, stream):
    # pick a key whose LAST pre-half event is a delete and which never
    # reappears in the tail
    half = 4000
    winners = lww_dedup(stream.where(F.col("lsn") <= half)).where(
        F.col("op") == "delete"
    )
    tail_keys = stream.where(F.col("lsn") > half).select("repo", "path", "commit")
    dead = winners.join(tail_keys, ["repo", "path", "commit"], "left_anti").first()
    if dead is None:
        pytest.skip("seed produced no key deleted before the snapshot")
    lake = LakeTable.create(str(tmp_path / "t"), spark, n_buckets=8)
    snapshot_then_stream(lake, _snapshot_at(stream, half), half, stream, batch_lsns=3000)
    got = lake.read().where(
        (F.col("repo") == dead["repo"])
        & (F.col("path") == dead["path"])
        & (F.col("commit") == dead["commit"])
    )
    assert got.count() == 0, "fenced-out pre-snapshot upserts resurrected a deleted key"


def test_bootstrap_exactly_once_and_resume_idempotent(spark, tmp_path, stream):
    half = 4000
    lake = LakeTable.create(str(tmp_path / "t"), spark, n_buckets=8)
    snap = _snapshot_at(stream, half)
    b1 = bootstrap_snapshot(lake, snap, half)
    assert not b1.get("skipped")
    assert bootstrap_snapshot(lake, snap, half)["skipped"] is True
    resume_replay(lake, stream, batch_lsns=3000)
    before = lake.state_checksum()
    # crash-and-rerun the whole handoff: everything skips, state unchanged
    b2, commits2 = snapshot_then_stream(lake, snap, half, stream, batch_lsns=3000)
    assert b2["skipped"] is True
    assert lake.state_checksum() == before


def test_bootstrap_from_another_lakes_read(spark, tmp_path, stream):
    """Seeding a new table from an existing lake's read() — read() keeps
    the internal _bucket column, which must not collide with the target
    merge's own bucket derivation (regression: COLUMN_ALREADY_EXISTS)."""
    half = 4000
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=8)
    replay(src, stream.where(F.col("lsn") <= half), batch_lsns=3000, max_lsn=half)
    late = LakeTable.create(str(tmp_path / "late"), spark, n_buckets=4)
    bootstrap_snapshot(late, src.read(), half)
    resume_replay(late, stream, batch_lsns=3000)
    full = LakeTable.create(str(tmp_path / "full"), spark, n_buckets=4)
    replay(full, stream, batch_lsns=3000)
    assert late.state_checksum() == full.state_checksum()


def test_snapshot_rejects_stream_metadata_columns(spark, tmp_path, stream):
    lake = LakeTable.create(str(tmp_path / "t"), spark, n_buckets=8)
    with pytest.raises(ValueError, match="lsn"):
        bootstrap_snapshot(lake, stream.limit(5), 10)


def test_tie_at_snapshot_lsn_snapshot_wins(spark, tmp_path):
    spark_df = spark.createDataFrame
    lake = LakeTable.create(str(tmp_path / "t"), spark, n_buckets=4)
    snap = spark_df(
        [("r1", "p1", "head", "py", "snapshot-image")],
        "repo string, path string, commit string, lang string, content string",
    )
    bootstrap_snapshot(lake, snap, 100)
    tail = spark_df(
        [
            (100, "r1", "p1", "head", "py", "stale-event-at-L"),
            (101, "r1", "p1", "head", "py", "post-snapshot"),
        ],
        "lsn long, repo string, path string, commit string, lang string, content string",
    ).select(
        "lsn", F.timestamp_seconds(F.col("lsn")).alias("op_ts"),
        F.lit("upsert").alias("op"), *PAYLOAD,
    )
    resume_replay(lake, tail, batch_lsns=1000)
    rows = lake.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "post-snapshot"
