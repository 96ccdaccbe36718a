"""Structured Streaming tail tests: file drop-zone -> availableNow drain ->
state equals batch replay of the same events; checkpoint restart does not
double-apply."""

import os

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable, oracle_replay, replay, synth_change_stream
from valentine_spark.streaming import stream_apply, stream_from_files


@pytest.fixture(scope="module")
def drop_zone(spark, tmp_path_factory):
    """Write the synthetic stream as two parquet 'WAL segment' files."""
    root = tmp_path_factory.mktemp("dropzone")
    stream = synth_change_stream(spark, 3000, 400, seed=11)
    stream.where(F.col("lsn") < 1500).coalesce(1).write.parquet(str(root / "seg0"))
    stream.where(F.col("lsn") >= 1500).coalesce(1).write.parquet(str(root / "seg1"))
    # flatten into one drop dir
    drop = tmp_path_factory.mktemp("drop_flat")
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(str(root / "seg*" / "*.parquet")))):
        shutil.copy(f, str(drop / f"events_{i}.parquet"))
    return str(drop), stream


def test_stream_apply_available_now(spark, tmp_path, drop_zone):
    drop_dir, stream = drop_zone
    lake = LakeTable.create(str(tmp_path / "stream_lake"), spark, n_buckets=8)
    q = stream_apply(
        stream_from_files(spark, drop_dir),
        lake,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    batch_lake = LakeTable.create(str(tmp_path / "batch_lake"), spark, n_buckets=8)
    replay(batch_lake, stream, batch_lsns=1000)
    assert lake.state_checksum() == batch_lake.state_checksum()

    # restart over the same checkpoint: nothing new -> no new commits
    v = lake.version
    q2 = stream_apply(
        stream_from_files(spark, drop_dir),
        lake,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    assert lake.version == v


def test_stateful_repo_stats(spark, tmp_path, drop_zone):
    """applyInPandasWithState custom operator: running per-repo stats over
    two availableNow drains accumulate across micro-batches via GroupState."""
    from pyspark.sql import functions as F

    from valentine_spark.streaming import run_repo_stats

    drop_dir, stream = drop_zone
    q = run_repo_stats(
        stream_from_files(spark, drop_dir),
        checkpoint_dir=str(tmp_path / "stats_ckpt"),
        query_name="repo_stats_test",
    )
    q.awaitTermination(120)

    # latest update per repo from the memory sink
    sink = spark.table("repo_stats_test")
    latest = {r["repo"]: r.asDict() for r in sink.collect()}

    expected = {
        r["repo"]: r.asDict()
        for r in stream.groupBy("repo")
        .agg(
            F.count("*").alias("n_events"),
            F.sum((F.col("op") == "insert").cast("long")).alias("n_inserts"),
            F.sum((F.col("op") == "update").cast("long")).alias("n_updates"),
            F.sum((F.col("op") == "delete").cast("long")).alias("n_deletes"),
            F.max("lsn").alias("max_lsn"),
            F.countDistinct("path").alias("n_paths"),
        )
        .collect()
    }
    assert set(latest) == set(expected)
    for repo, exp in expected.items():
        got = latest[repo]
        for k in ("n_events", "n_inserts", "n_updates", "n_deletes", "max_lsn",
                  "n_paths"):
            assert got[k] == exp[k], (repo, k, got[k], exp[k])
        assert got["n_paths_exact"] is True  # fixture is far below the cap


def test_windowed_counts_with_watermark(spark, tmp_path, drop_zone):
    """Watermarked tumbling windows over event time: every closed window's
    counts equal the batch groupBy over the same window buckets."""
    from pyspark.sql import functions as F

    from valentine_spark.streaming import run_windowed_counts

    drop_dir, stream = drop_zone
    q = run_windowed_counts(
        stream_from_files(spark, drop_dir),
        checkpoint_dir=str(tmp_path / "win_ckpt"),
        query_name="win_counts_test",
        window_duration="1 second",
        lateness="0 seconds",
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["op"]): (r["n_events"], r["max_lsn"])
        for r in spark.table("win_counts_test").collect()
    }
    assert got, "no windows finalized"

    expected_df = (
        stream.groupBy(F.window("op_ts", "1 second").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n"), F.max("lsn").alias("m"))
        .select(F.col("w.start").alias("s"), "op", "n", "m")
    )
    expected = {(r["s"], r["op"]): (r["n"], r["m"]) for r in expected_df.collect()}
    # every emitted (closed) window matches the batch computation; the last
    # window may be unclosed and absent from the append-mode output
    for key, val in got.items():
        assert expected[key] == val, key
    assert len(got) >= len(expected) - 5  # only trailing windows may be open


def test_stateful_stats_survive_restart(spark, tmp_path, drop_zone):
    """GroupState must accumulate across query RESTARTS (recoverable
    foreachBatch-parquet sink; the memory sink cannot recover)."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from valentine_spark.streaming import run_repo_stats

    drop_dir, stream = drop_zone
    # fresh private drop dir: first half only
    drop2 = str(tmp_path / "drop2")
    import os

    os.makedirs(drop2)
    files = sorted(glob.glob(f"{drop_dir}/*.parquet"))
    shutil.copy(files[0], drop2)

    sink = str(tmp_path / "stats_sink")
    ck = str(tmp_path / "stats_ck")
    q = run_repo_stats(stream_from_files(spark, drop2), ck, sink_path=sink)
    q.awaitTermination(120)

    for f in files[1:]:
        shutil.copy(f, drop2)
    q = run_repo_stats(stream_from_files(spark, drop2), ck, sink_path=sink)
    q.awaitTermination(120)

    latest = {
        r["repo"]: r["n"]
        for r in spark.read.parquet(sink).groupBy("repo").agg(F.max("n_events").alias("n")).collect()
    }
    expected = {
        r["repo"]: r["n"] for r in stream.groupBy("repo").agg(F.count("*").alias("n")).collect()
    }
    assert latest == expected


def test_gap_sessions_matches_sessionize_batch(spark):
    """Two independent sessionization implementations agree: the native
    session_window formulation vs the lag/sum window formulation, on the
    real testdata events."""
    from valentine_spark.operators import sessionize
    from valentine_spark.streaming import gap_sessions

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in gap_sessions(ev, gap="30 minutes").collect()
    }
    b = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"], r["total_value"])
        for r in sessionize(ev, gap_minutes=30).collect()
    }
    assert a == b and a


def test_sessionize_sliced_matches_single_window(spark):
    """The skew-proof time-sliced sessionization is row-identical (incl.
    session_seq numbering) to the single-window form — on real testdata AND
    on an adversarial synthetic stream with exact-gap deltas, events
    straddling slice boundaries, and one session spanning many slices."""
    import datetime as dt

    from valentine_spark.operators import sessionize
    from valentine_spark.operators.window_ops import sessionize_sliced

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for kwargs in ({}, {"slice_minutes": 45}, {"slice_minutes": 120}):
        a = {tuple(r) for r in sessionize(ev, gap_minutes=30).collect()}
        b = {tuple(r) for r in sessionize_sliced(ev, gap_minutes=30, **kwargs).collect()}
        assert a == b and a, kwargs

    # adversarial: gap = 30 min, slice = 30 min.  u1: a session of events
    # every 29 min spanning >4 slices, then an exact-gap delta (stays in
    # the same session: strict >), then gap+1s (new session).  u2: events
    # 1 s either side of a slice boundary (same session, must stitch).
    # u3: single event exactly on a slice boundary.  u4: two events >2
    # slices apart (never merge).
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    t = base
    for i in range(10):  # u1 chain, 29-min steps; last event at base+261min
        rows.append((1, 100 + i, t, "click", 1.0))
        last = t
        t += dt.timedelta(minutes=29)
    exact = last + dt.timedelta(minutes=30)
    rows.append((1, 110, exact, "click", 1.0))  # exact gap: SAME session
    rows.append((1, 111, exact + dt.timedelta(minutes=30, seconds=1), "click", 1.0))  # gap+1s: NEW
    bnd = dt.datetime(2024, 1, 1, 3, 0, 0)  # a 30-min slice boundary
    rows += [(2, 200, bnd - dt.timedelta(seconds=1), "view", 2.5),
             (2, 201, bnd + dt.timedelta(seconds=1), "view", 2.5)]
    rows.append((3, 300, bnd, "view", 0.125))
    rows += [(4, 400, base, "click", 1.0),
             (4, 401, base + dt.timedelta(hours=2), "click", 1.0)]
    adv = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp_ntz, event_type string, value double"
    )
    a = {tuple(r) for r in sessionize(adv, gap_minutes=30).collect()}
    b = {tuple(r) for r in sessionize_sliced(adv, gap_minutes=30).collect()}
    assert a == b
    by_user = {}
    for r in sessionize_sliced(adv, gap_minutes=30).collect():
        by_user.setdefault(r["user_id"], []).append(r)
    assert sorted(r["session_seq"] for r in by_user[1]) == [1, 2]
    assert [r["n_events"] for r in sorted(by_user[1], key=lambda r: r["session_seq"])] == [11, 1]
    assert len(by_user[2]) == 1 and by_user[2][0]["n_events"] == 2
    assert len(by_user[4]) == 2

    with pytest.raises(ValueError):
        sessionize_sliced(adv, gap_minutes=30, slice_minutes=15)


def test_streaming_gap_sessions_available_now(spark, tmp_path):
    """Streaming sessionization (watermark + session_window, append mode)
    emits exactly the finalized sessions of the batch computation."""
    from pyspark.sql import functions as F

    from valentine_spark.streaming import gap_sessions, run_gap_sessions

    # watermarks require TIMESTAMP (with local tz); testdata is NTZ
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 20)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    drop = tmp_path / "events_drop"
    ev.coalesce(1).write.parquet(str(drop))
    # sentinel far-future event pushes the watermark past every real session
    sentinel = ev.limit(1).select(
        F.col("event_id"), F.col("ts") + F.expr("INTERVAL 365 DAYS"),
        F.lit(-1).cast("long").alias("user_id"), F.col("event_type"), F.col("value"), F.col("props"),
    ).toDF(*ev.columns)
    sentinel.write.mode("append").parquet(str(drop))

    stream = spark.readStream.schema(ev.schema).parquet(str(drop))
    q = run_gap_sessions(stream, str(tmp_path / "ckpt"), query_name="gap_sessions_t")
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("gap_sessions_t").collect() if r["user_id"] >= 0
    }
    expect = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in gap_sessions(ev, gap="30 minutes").collect()
    }
    assert got == expect and got


def test_stream_kill_and_restart_exactly_once(spark, tmp_path, drop_zone):
    """Kill the foreachBatch query mid-stream — AFTER a micro-batch's lake
    commit but BEFORE Structured Streaming checkpoints it (the exactly-once
    danger window) — restart from the same checkpoint, and assert the final
    state equals a one-shot batch replay: the re-delivered batch must be
    skipped by the lake's applied-batch manifest, not double-applied.
    (VERDICT r2 #9 — the streaming twin of the batch crash-window test.)"""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from valentine_spark.cdc import apply_batch
    from valentine_spark.streaming.stream import stream_from_files

    drop_dir, stream = drop_zone
    lake = LakeTable.create(str(tmp_path / "kill_lake"), spark, n_buckets=8)
    ckpt = str(tmp_path / "kill_ckpt")
    crashed = {"done": False}

    def crashing_process(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        apply_batch(lake, batch_df, batch_id=f"stream-{batch_id}")
        # crash on the SECOND micro-batch after its commit: the checkpoint
        # never records batch 1 as complete, so restart re-delivers it
        if batch_id == 1 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after commit, before checkpoint")

    # maxFilesPerTrigger=1 over the 2-file drop zone -> 2 micro-batches
    src = stream_from_files(spark, drop_dir, max_files_per_trigger=1)
    q = (
        src.writeStream.foreachBatch(crashing_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    assert crashed["done"]
    v_after_crash = lake.version

    # restart over the same checkpoint: batch 1 is re-delivered and must be
    # skipped (idempotent apply), batch 2+ (none here) would continue
    q2 = (
        stream_from_files(spark, drop_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(crashing_process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert lake.version == v_after_crash  # no double-apply commit

    batch_lake = LakeTable.create(str(tmp_path / "kill_batch_lake"), spark, n_buckets=8)
    replay(batch_lake, stream, batch_lsns=1000)
    assert lake.state_checksum() == batch_lake.state_checksum()
