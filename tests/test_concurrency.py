"""Multi-writer optimistic concurrency for the lake (the Delta log-store /
Iceberg catalog-CAS analogue, here expressed as a put-if-absent ``os.link``
on the snapshot file — see ``lake.py`` module docstring).

What must hold, and is asserted below:

* every racing commit lands exactly once (no lost updates — the failure the
  old unconditional ``os.replace`` pointer install permitted);
* the final state equals SOME serial order of the commits (for disjoint key
  sets: the union; for a duplicate batch id: one application);
* a background compactor racing a live MoR ingest never loses a batch and
  never changes table state;
* a crash between snapshot publish and pointer advance leaves a fully
  committed table (readers walk the CURRENT hint forward);
* expiry honours a retention grace so it cannot reap a concurrent writer's
  staged-but-not-yet-published files.

Threads are the vehicle (one SparkSession, thread-safe job submission, one
LakeTable handle per writer) — the protocol itself is filesystem-atomic, so
process count is irrelevant to what is being proven.
"""

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import (
    KEY_COLS,
    CommitConflictError,
    LakeTable,
    apply_batch,
    lww_dedup,
    replay,
    synth_change_stream,
)

N_EVENTS = 4_000
N_KEYS = 500


@pytest.fixture(scope="module")
def stream(spark):
    return synth_change_stream(spark, N_EVENTS, N_KEYS, seed=11).cache()


def _run_threads(fns):
    """Start all callables behind a barrier; re-raise the first failure."""
    barrier = threading.Barrier(len(fns))
    errors = []

    def wrap(fn):
        def go():
            barrier.wait()
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — re-raised below
                errors.append(e)

        return go

    threads = [threading.Thread(target=wrap(fn)) for fn in fns]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        raise errors[0]


def _writer_slices(stream, n_writers):
    """Disjoint key/lsn slices so the serial-order expectation is the union."""
    return [
        stream.where(F.pmod(F.xxhash64(*KEY_COLS), F.lit(n_writers)) == i)
        for i in range(n_writers)
    ]


def test_concurrent_mor_writers_all_land(spark, tmp_path, stream):
    """N MoR writers racing disjoint batches: every batch applies exactly
    once and the final state is the union of the per-writer LWW states."""
    root = str(tmp_path / "mor_race")
    lake = LakeTable.create(root, spark, n_buckets=8, write_mode="mor")
    slices = _writer_slices(stream, 3)

    def make(i):
        handle = LakeTable(root, spark)  # one handle per writer

        def go():
            apply_batch(handle, slices[i], f"writer-{i}")

        return go

    _run_threads([make(i) for i in range(3)])

    applied = set(lake.applied_batches())
    assert {"writer-0", "writer-1", "writer-2"} <= applied
    assert lake.version == 3  # three commits, contiguous versions

    # union of disjoint slices == LWW over the whole stream minus deletes
    exp_keys = {tuple(r) for r in lww_dedup(stream).where(F.col("op") != "delete")
                .select(*KEY_COLS).collect()}
    got_keys = {tuple(r) for r in lake.read().select(*KEY_COLS).collect()}
    assert got_keys == exp_keys


def test_concurrent_cow_writers_disjoint_keys(spark, tmp_path, stream):
    """COW writers racing batches that can touch the SAME buckets: the loser
    re-runs its body (rewrite invalidated) and both land; state equals the
    union of the disjoint key sets."""
    root = str(tmp_path / "cow_race")
    LakeTable.create(root, spark, n_buckets=8)
    slices = _writer_slices(stream, 2)

    def make(i):
        handle = LakeTable(root, spark)

        def go():
            apply_batch(handle, slices[i], f"cow-{i}")

        return go

    _run_threads([make(i) for i in range(2)])

    lake = LakeTable(root, spark)
    assert {"cow-0", "cow-1"} <= set(lake.applied_batches())
    exp_keys = {tuple(r) for r in lww_dedup(stream).where(F.col("op") != "delete")
                .select(*KEY_COLS).collect()}
    got_keys = {tuple(r) for r in lake.read().select(*KEY_COLS).collect()}
    assert got_keys == exp_keys


def test_duplicate_batch_id_across_writers_lands_once(spark, tmp_path, stream):
    """Two writers racing the SAME batch id (a split-brain re-delivery):
    exactly one application — the loser's rebase re-checks the applied set
    against the winner's snapshot and skips."""
    root = str(tmp_path / "dup_race")
    LakeTable.create(root, spark, n_buckets=8, write_mode="mor")
    batch = stream.where(F.col("lsn") < 2000)
    results = {}

    def make(i):
        handle = LakeTable(root, spark)

        def go():
            results[i] = apply_batch(handle, batch, "same-batch")

        return go

    _run_threads([make(i) for i in range(2)])

    lake = LakeTable(root, spark)
    assert lake.applied_batches().count("same-batch") == 1
    skipped = [r for r in results.values() if r.get("skipped")]
    committed = [r for r in results.values() if not r.get("skipped")]
    # one side may lose the race before its Spark write starts (then it sees
    # is_applied up front and skips) or after (rebase skip) — either way
    # exactly one commit happened
    assert len(committed) == 1 and len(skipped) == 1
    assert lake.version == 1


def test_compactor_races_ingest(spark, tmp_path, stream):
    """A background compactor looping beside a live MoR replay: no batch is
    lost, no state change is introduced, and the table ends equal to an
    uninterrupted serial replay."""
    root = str(tmp_path / "compact_race")
    lake = LakeTable.create(root, spark, n_buckets=8, write_mode="mor")
    ingest_handle = LakeTable(root, spark)
    compact_handle = LakeTable(root, spark)
    stop = threading.Event()

    def ingest():
        try:
            replay(ingest_handle, stream, batch_lsns=500)
        finally:
            stop.set()

    def compactor():
        while not stop.is_set():
            compact_handle.compact_if_needed(max_files_per_bucket=2)

    _run_threads([ingest, compactor])

    serial_root = str(tmp_path / "serial")
    serial = LakeTable.create(serial_root, spark, n_buckets=8, write_mode="mor")
    replay(serial, stream, batch_lsns=500)
    assert lake.state_checksum() == serial.state_checksum()


def test_current_pointer_is_a_hint(spark, tmp_path, stream):
    """A committer that dies between publishing v{N}.json and advancing
    CURRENT leaves a fully committed snapshot: readers and the next writer
    walk forward past the stale hint."""
    root = str(tmp_path / "stale_hint")
    lake = LakeTable.create(root, spark, n_buckets=8)
    apply_batch(lake, stream.where(F.col("lsn") < 1500), "b1")
    v_published = lake.version
    rows_published = lake.read().count()

    # simulate the crash: rewind CURRENT to the previous version
    with open(os.path.join(root, "metadata", "CURRENT"), "w") as fh:
        fh.write(str(v_published - 1))

    fresh = LakeTable(root, spark)
    assert fresh.version == v_published  # forward walk found the snapshot
    assert fresh.read().count() == rows_published

    # the next commit lands ON TOP of the published version, not beside it
    apply_batch(fresh, stream.where((F.col("lsn") >= 1500) & (F.col("lsn") < 3000)), "b2")
    assert fresh.version == v_published + 1
    assert "b1" in fresh.applied_batches() and "b2" in fresh.applied_batches()


def test_snapshot_install_is_put_if_absent(spark, tmp_path, stream):
    """Direct protocol check: installing a version that already exists
    fails (returns False) and changes nothing — the primitive every
    higher-level guarantee rests on."""
    root = str(tmp_path / "cas")
    lake = LakeTable.create(root, spark, n_buckets=8)
    apply_batch(lake, stream.where(F.col("lsn") < 1000), "b1")
    meta = lake.metadata()
    before = json.load(open(os.path.join(root, "metadata", f"v{meta['version']}.json")))
    clobber = {**meta, "buckets": {}}  # would wipe the table if it installed
    assert lake._try_install_snapshot(clobber) is False
    after = json.load(open(os.path.join(root, "metadata", f"v{meta['version']}.json")))
    assert after == before


def test_expire_grace_protects_inflight_files(spark, tmp_path, stream):
    """``min_age_seconds`` keeps young unreferenced files (a concurrent
    writer's staged-but-unpublished commit); 0 reaps them."""
    root = str(tmp_path / "grace")
    lake = LakeTable.create(root, spark, n_buckets=8)
    apply_batch(lake, stream.where(F.col("lsn") < 1500), "b1")
    apply_batch(lake, stream.where((F.col("lsn") >= 1500) & (F.col("lsn") < 3000)), "b2")

    # fake an in-flight commit: a staged data file referenced by no snapshot
    staged = os.path.join(root, "data", "c-inflight", "_bucket=0")
    os.makedirs(staged)
    orphan = os.path.join(staged, "part-0.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"not yet published")

    res = lake.expire_snapshots(keep_last=1, min_age_seconds=3600)
    assert os.path.exists(orphan), "grace window must protect young staged files"

    res = lake.expire_snapshots(keep_last=1, min_age_seconds=0)
    assert not os.path.exists(orphan)
    assert res["removed_files"] >= 1
    # the surviving snapshot still reads
    assert lake.read().count() > 0


def test_create_rejects_existing_table(spark, tmp_path):
    root = str(tmp_path / "dup_create")
    LakeTable.create(root, spark, n_buckets=4)
    with pytest.raises(FileExistsError):
        LakeTable.create(root, spark, n_buckets=4)
