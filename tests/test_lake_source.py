"""lake_changes Python Data Source (streaming/lake_source.py): the
Structured-Streaming face of the lake changelog.

Core contract under test: for any offset window, the source's output equals
``LakeTable.changes(start, end)`` — on clean (COW), dirty (merge-on-read),
delete-heavy, and schema-evolved state — and Spark's checkpointed offset log
resumes it without loss or duplication.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable, replay, synth_change_stream
from valentine_spark.streaming.lake_source import (
    LakeChangesStreamReader,
    register_lake_changes,
)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_matches_changes(spark, lake, got_df, v0, v1):
    want = lake.changes(v0, v1).toPandas()
    got = got_df.toPandas() if not isinstance(got_df, pd.DataFrame) else got_df
    assert _canon(got).equals(_canon(want)), (
        f"source window v{v0}->v{v1}: {len(got)} rows vs changes() {len(want)}"
    )


def _reader_window_df(spark, lake, v0, v1):
    """Drive the reader's partitions()/read() directly (unit level) and
    assemble the window's output as a Spark DataFrame."""
    reader = LakeChangesStreamReader(
        _source_schema(lake), {"path": lake.root, "startingversion": str(v0)}
    )
    parts = reader.partitions({"version": v0}, {"version": v1})
    batches = [b for p in parts for b in reader.read(p)]
    if not batches:
        return spark.createDataFrame([], _source_schema(lake))
    pdf = pd.concat([b.to_pandas() for b in batches], ignore_index=True)
    return spark.createDataFrame(pdf, _source_schema(lake))


def _source_schema(lake):
    import pyspark.sql.types as T

    return T.StructType(
        [T.StructField("change_op", T.StringType(), False)]
        + list(lake.schema.fields)
    )


def test_reader_window_equals_changes_cow(spark, tmp_path):
    stream = synth_change_stream(spark, 4_000, 700, seed=101).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=4)
    replay(lake, stream, batch_lsns=1_000, max_lsn=3_999)
    v = lake.version
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 0, v), 0, v)
    # interior window too (not just full history)
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 2, v), 2, v)


def test_reader_window_equals_changes_mor_dirty(spark, tmp_path):
    """Dirty merge-on-read buckets: the executor-side pyarrow resolution
    (max (version, liveness) per key) must agree with the lake's own."""
    stream = synth_change_stream(spark, 4_000, 600, seed=103).cache()
    lake = LakeTable.create(
        str(tmp_path / "l"), spark, n_buckets=4, write_mode="mor"
    )
    replay(lake, stream, batch_lsns=1_000, max_lsn=3_999)
    assert lake.metadata().get("dirty"), "fixture must exercise dirty buckets"
    v = lake.version
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 0, v), 0, v)
    _assert_matches_changes(spark, lake, _reader_window_df(spark, lake, 1, v - 1), 1, v - 1)


def test_reader_handles_deletes_and_evolution(spark, tmp_path):
    import pyspark.sql.types as T

    stream = synth_change_stream(
        spark, 3_000, 400, seed=107, delete_fraction=0.3
    ).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_500), batch_lsns=750, max_lsn=1_499)
    lake.evolve_schema([T.StructField("stars", T.LongType())], note="test")
    replay(
        lake,
        stream.where(F.col("lsn") >= 1_500),
        batch_lsns=750,
        batch_id_prefix="tail",
        max_lsn=2_999,
    )
    v = lake.version
    df = _reader_window_df(spark, lake, 0, v)
    assert "stars" in df.columns
    deletes = df.where(F.col("change_op") == "delete")
    assert deletes.where(F.col("content").isNotNull()).count() == 0
    _assert_matches_changes(spark, lake, df, 0, v)


def test_streaming_end_to_end_and_checkpoint_resume(spark, tmp_path):
    """The real readStream path: offsets advance through Spark's checkpoint,
    a restart delivers only post-stop commits, nothing twice."""
    register_lake_changes(spark)
    stream = synth_change_stream(spark, 3_000, 500, seed=109).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 2_000), batch_lsns=1_000, max_lsn=1_999)
    v_mid = lake.version

    ckpt = str(tmp_path / "ckpt")
    collected = []

    def run_once():
        q = (
            spark.readStream.format("lake_changes")
            .load(lake.root)
            .writeStream.foreachBatch(
                lambda df, bid: collected.append(df.toPandas())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = pd.concat(collected, ignore_index=True)
    _assert_matches_changes(
        spark, lake, spark.createDataFrame(first, _source_schema(lake)), 0, v_mid
    )

    collected.clear()
    replay(
        lake,
        stream.where(F.col("lsn") >= 2_000),
        batch_lsns=1_000,
        batch_id_prefix="tail",
        max_lsn=2_999,
    )
    run_once()
    second = pd.concat(collected, ignore_index=True) if collected else pd.DataFrame()
    assert len(second), "restart must deliver the post-stop window"
    _assert_matches_changes(
        spark,
        lake,
        spark.createDataFrame(second, _source_schema(lake)),
        v_mid,
        lake.version,
    )


def test_starting_version_latest(spark, tmp_path):
    stream = synth_change_stream(spark, 2_000, 300, seed=113).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream, batch_lsns=1_000, max_lsn=1_999)
    reader = LakeChangesStreamReader(
        _source_schema(lake), {"path": lake.root, "startingversion": "latest"}
    )
    assert reader.initialOffset() == {"version": lake.version}
    assert reader.partitions(reader.initialOffset(), reader.latestOffset()) == []


def test_include_before_option_matches_batch_changes(spark, tmp_path):
    """includeBefore=true: the streaming source's before-image columns equal
    changes(include_before=True) for the same window."""
    stream = synth_change_stream(spark, 3_000, 400, seed=127).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_500), batch_lsns=750, max_lsn=1_499)
    v_mid = lake.version
    replay(lake, stream.where(F.col("lsn") >= 1_500), batch_lsns=750,
           batch_id_prefix="t", max_lsn=2_999)

    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("change_op", T.StringType(), False)]
        + list(lake.schema.fields)
        + [T.StructField(f"_before_{f.name}", f.dataType)
           for f in lake.schema.fields if f.name not in ("repo", "path", "commit")]
    )
    reader = LakeChangesStreamReader(
        schema, {"path": lake.root, "startingversion": str(v_mid)}
    )
    parts = reader.partitions({"version": v_mid}, {"version": lake.version})
    got = pd.concat([b.to_pandas() for p in parts for b in reader.read(p)],
                    ignore_index=True)
    want = lake.changes(v_mid, include_before=True).toPandas()
    assert _canon(got).equals(_canon(want))


def test_streaming_ivm_end_to_end(spark, tmp_path):
    """Incremental view maintenance driven by the STREAMING source: the
    view is bootstrapped from the half-replayed state, then rolled forward
    only by readStream micro-batches (includeBefore), and must equal a
    from-scratch GROUP BY over the final state."""
    from valentine_spark.cdc import init_aggregate, maintain_aggregate

    register_lake_changes(spark)
    stream = synth_change_stream(spark, 3_000, 400, seed=131).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_500), batch_lsns=750, max_lsn=1_499)

    measures = {"files": ("count", None), "bytes": ("sum", "clen")}

    def prep(df):
        out = df.withColumn("clen", F.length(F.coalesce(F.col("content"), F.lit(""))))
        if "_before_content" in df.columns:
            out = out.withColumn(
                "_before_clen",
                F.length(F.coalesce(F.col("_before_content"), F.lit(""))),
            )
        return out

    state = {"view": init_aggregate(prep(lake.read()), ["lang"], measures).toPandas()}
    v_bootstrap = lake.version  # the view reflects exactly this snapshot

    def on_batch(df, _bid):
        if df.isEmpty():
            return
        prev = spark.createDataFrame(state["view"])
        state["view"] = maintain_aggregate(prev, prep(df), ["lang"], measures).toPandas()

    def drain():
        q = (
            spark.readStream.format("lake_changes")
            .option("startingVersion", str(v_bootstrap))
            .option("includeBefore", "true")
            .load(lake.root)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    replay(lake, stream.where((F.col("lsn") >= 1_500) & (F.col("lsn") < 2_250)),
           batch_lsns=750, batch_id_prefix="t1", max_lsn=2_249)
    drain()
    replay(lake, stream.where(F.col("lsn") >= 2_250), batch_lsns=750,
           batch_id_prefix="t2", max_lsn=2_999)
    drain()

    want = init_aggregate(prep(lake.read()), ["lang"], measures).toPandas()
    got = state["view"]
    key = lambda df: df.sort_values("lang").reset_index(drop=True)[sorted(df.columns)]
    assert key(got).astype(str).equals(key(want).astype(str))


def test_max_versions_per_batch_offset_protocol(spark, tmp_path):
    """Admission control at the offset level (maxVersionsPerBatch): after
    the first (uncapped, restart-safe) catch-up offset, latestOffset
    advances at most N versions per call, never regresses behind a
    committed or replayed offset, and converges to the lake head."""
    stream = synth_change_stream(spark, 2_000, 400, seed=131).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream, batch_lsns=250, max_lsn=1_999)  # 8 commits
    head = lake.version
    assert head >= 8

    reader = LakeChangesStreamReader(
        _source_schema(lake),
        {"path": lake.root, "startingversion": "0", "maxversionsperbatch": "2"},
    )
    # FRESH query: initialOffset seeds the cap, so even the first backfill
    # is metered — never one (start, head] batch over a deep history
    assert reader.initialOffset() == {"version": 0}
    seen0 = [0]
    while seen0[-1] < head:
        nxt = reader.latestOffset()["version"]
        assert 0 < nxt - seen0[-1] <= 2
        seen0.append(nxt)
    assert seen0[-1] == head
    # no new commits: offset must hold at head, not wander
    assert reader.latestOffset()["version"] == head

    # RESTART (no initialOffset call): the committed position is not
    # observable, so the first call is the safe uncapped catch-up base
    restarted = LakeChangesStreamReader(
        _source_schema(lake),
        {"path": lake.root, "startingversion": "0", "maxversionsperbatch": "2"},
    )
    assert restarted.latestOffset()["version"] == head

    # new commits land; the cap meters them out 2 versions per call
    stream2 = synth_change_stream(spark, 1_200, 300, seed=132).cache()
    replay(lake, stream2, batch_lsns=200, batch_id_prefix="t", max_lsn=1_199)  # 6 more
    new_head = lake.version
    seen = [head]
    while seen[-1] < new_head:
        nxt = reader.latestOffset()["version"]
        assert 0 < nxt - seen[-1] <= 2
        seen.append(nxt)
    assert seen[-1] == new_head
    assert len(seen) >= 1 + (new_head - head + 1) // 2

    # a replayed partitions() call teaches a FRESH reader the position: its
    # next capped offset builds on the replayed end, not on version 0
    reader2 = LakeChangesStreamReader(
        _source_schema(lake),
        {"path": lake.root, "startingversion": "0", "maxversionsperbatch": "2"},
    )
    reader2.partitions({"version": head}, {"version": head + 2})  # Spark replays
    nxt = reader2.latestOffset()["version"]
    assert nxt == head + 4  # capped continuation, no regression to v0

    # commit() is a floor too
    reader2.commit({"version": new_head})
    assert reader2.latestOffset()["version"] == new_head


def test_max_versions_per_batch_streaming_end_to_end(spark, tmp_path):
    """A live capped stream: commits that land after the first batch are
    delivered in micro-batches of <= 2 versions each, and the union of all
    batches equals the full changelog window."""
    register_lake_changes(spark)
    stream = synth_change_stream(spark, 2_400, 400, seed=133).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 400), batch_lsns=200, max_lsn=399)

    collected = []
    q = (
        spark.readStream.format("lake_changes")
        .option("maxVersionsPerBatch", "2")
        .load(lake.root)
        .writeStream.foreachBatch(lambda df, bid: collected.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # first (uncapped) batch: the 2 base commits
        n_first = len(collected)
        replay(lake, stream.where(F.col("lsn") >= 400), batch_lsns=200,
               batch_id_prefix="t", max_lsn=2_399)  # 10 more commits
        q.processAllAvailable()
    finally:
        q.stop()
    tail_batches = len(collected) - n_first
    assert tail_batches >= 5, f"10 capped commits should need >=5 batches, got {tail_batches}"
    # exactly-once composition: applying the batches in order (upsert on
    # insert/update, remove on delete) must rebuild the lake's final state
    state = {}
    for pdf in collected:
        for r in pdf.itertuples(index=False):
            key = (r.repo, r.path, r.commit)
            if r.change_op == "delete":
                state.pop(key, None)
            else:
                state[key] = (r.lang, r.content)
    want = {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in lake.read().collect()
    }
    assert state == want


def test_restart_from_expired_offset_fails_loudly(spark, tmp_path):
    """Retention racing a lagging STREAM: if the checkpointed offset's
    snapshot has been expired, a restart must fail with the actionable
    retention message — never silently emit a wrong (non-incremental)
    window.  This is the streaming-source counterpart of the follower's
    SnapshotExpiredError full-resync (cdc/follow.py): a source cannot
    auto-resync, because replaying the whole table as one "incremental"
    batch would silently change downstream semantics."""
    register_lake_changes(spark)
    stream = synth_change_stream(spark, 3_000, 500, seed=211).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_000), batch_lsns=500, max_lsn=999)

    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format("lake_changes")
            .load(lake.root)
            .writeStream.foreachBatch(lambda df, bid: df.count())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # checkpoint now holds the current head offset

    # advance several commits, then expire everything but the newest head:
    # the checkpointed offset's snapshot JSON is gone
    replay(
        lake,
        stream.where(F.col("lsn") >= 1_000),
        batch_lsns=500,
        batch_id_prefix="tail",
        max_lsn=2_999,
    )
    lake.expire_snapshots(keep_last=1)

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException) as exc:
        run_once()
    assert "expired by retention" in str(exc.value)
