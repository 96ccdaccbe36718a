"""Native lake streaming SINK (streaming/lake_sink.py): writeStream.format(
"lake") — exactly-once merge-on-read commits from executor-staged Arrow
batches, composable with the lake_changes source into a declarative mirror.

Core contracts under test: state equality with the source across restarts
(including cross-batch deletes via tombstones), idempotent commit under
batch replay, the pinned-layout/schema conflict rules, and that sink-written
files carry the same manifest stats (khash + stats_cols bounds) the Spark
write path collects.
"""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable, replay, synth_change_stream
from valentine_spark.cdc.lake import CommitConflictError
from valentine_spark.sources.lake_batch import register_lake
from valentine_spark.streaming.lake_source import register_lake_changes
from valentine_spark.streaming.lake_sink import (
    LakeStreamWriter,
    prepare_lake_sink,
)


def _state(lake) -> pd.DataFrame:
    pdf = lake.read().toPandas()
    return pdf[sorted(pdf.columns)].sort_values(
        ["repo", "path", "commit"]
    ).reset_index(drop=True)


def _mirror_once(spark, src_root: str, dst_root: str, ckpt: str) -> None:
    q = (
        prepare_lake_sink(
            spark.readStream.format("lake_changes").load(src_root), dst_root
        )
        .writeStream.format("lake")
        .option("path", dst_root)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.fixture
def registered(spark):
    register_lake(spark)
    register_lake_changes(spark)
    return spark


def test_mirror_restart_and_cross_batch_deletes(registered, tmp_path):
    """Two runs over one checkpoint: the restart delivers only the new
    window, deletes of keys mirrored in run 1 propagate as tombstones, and
    the final states are equal."""
    spark = registered
    stream = synth_change_stream(spark, 4_000, 500, seed=211).cache()
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=2)
    dst = LakeTable.create(str(tmp_path / "dst"), spark, n_buckets=2)
    ckpt = str(tmp_path / "ckpt")

    replay(src, stream.where(F.col("lsn") < 2_000), batch_lsns=1_000, max_lsn=1_999)
    _mirror_once(spark, src.root, dst.root, ckpt)
    assert _state(dst).equals(_state(src))
    v_after_first = dst.version

    replay(
        src,
        stream.where(F.col("lsn") >= 2_000),
        batch_lsns=1_000,
        batch_id_prefix="tail",
        max_lsn=3_999,
    )
    _mirror_once(spark, src.root, dst.root, ckpt)
    assert _state(dst).equals(_state(src))
    lineage = dst.lineage()
    assert all(c["mode"] == "stream" for c in lineage)
    # the restarted run must not have re-applied batch 0
    assert len([c for c in lineage if c.get("stream_batch") == 0]) == 1
    assert dst.version > v_after_first
    # the second window's diff against run-1 state must include deletes
    # (synth stream mixes ops), proving the tombstone path executed
    assert sum(c.get("rows_deleted", 0) for c in lineage) > 0
    assert any(c.get("tomb_files", 0) > 0 for c in lineage)


def test_multiple_microbatches_one_run(registered, tmp_path):
    """maxVersionsPerBatch on the source slices the catch-up into several
    micro-batches; each becomes its own exactly-once sink commit."""
    spark = registered
    stream = synth_change_stream(spark, 3_000, 400, seed=223).cache()
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=2)
    replay(src, stream.where(F.col("lsn") < 750), batch_lsns=750, max_lsn=749)
    dst = LakeTable.create(str(tmp_path / "dst"), spark, n_buckets=2)
    q = (
        prepare_lake_sink(
            spark.readStream.format("lake_changes")
            .option("maxVersionsPerBatch", "1")
            .load(src.root),
            dst.root,
        )
        .writeStream.format("lake")
        .option("path", dst.root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()  # backfill batch (uncapped)
        for lo in range(750, 3_000, 750):  # 3 more commits, capped 1/batch
            replay(
                src,
                stream.where(F.col("lsn").between(lo, lo + 749)),
                batch_lsns=750,
                batch_id_prefix=f"w{lo}",
                max_lsn=lo + 749,
            )
        q.processAllAvailable()
    finally:
        q.stop()
    assert _state(dst).equals(_state(src))
    batches = sorted(
        c["stream_batch"] for c in dst.lineage() if "stream_batch" in c
    )
    assert len(batches) >= 2 and batches == sorted(set(batches))


def test_commit_replay_is_skipped_and_empty_commit_lands(registered, tmp_path):
    spark = registered
    stream = synth_change_stream(spark, 1_500, 200, seed=229).cache()
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=2)
    replay(src, stream, batch_lsns=1_500, max_lsn=1_499)
    dst = LakeTable.create(str(tmp_path / "dst"), spark, n_buckets=2)
    ckpt = str(tmp_path / "ckpt")
    _mirror_once(spark, src.root, dst.root, ckpt)
    v1 = dst.version
    state1 = _state(dst)

    writer = LakeStreamWriter(
        T.StructType(
            [T.StructField("change_op", T.StringType())]
            + list(dst.schema.fields)
            + [
                T.StructField("_bucket", T.IntegerType()),
                T.StructField("_khash", T.LongType()),
                T.StructField("_n_buckets", T.IntegerType()),
            ]
        ),
        {"path": dst.root, "checkpointLocation": ckpt},
    )
    # replayed batch id (crash between commit and checkpoint): no-op
    writer.commit([], batchId=0)
    assert dst.version == v1
    assert _state(dst).equals(state1)
    # a genuinely new empty batch still lands (lineage + applied id)
    writer.commit([], batchId=99)
    assert dst.version == v1 + 1
    assert dst.is_applied(f"{writer.sink_id}#99")
    assert _state(dst).equals(state1)


def test_concurrent_layout_and_schema_changes_fail_commit(registered, tmp_path):
    spark = registered
    stream = synth_change_stream(spark, 1_500, 200, seed=233).cache()
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=2)
    replay(src, stream, batch_lsns=1_500, max_lsn=1_499)
    dst = LakeTable.create(str(tmp_path / "dst"), spark, n_buckets=2)
    ckpt = str(tmp_path / "ckpt")
    _mirror_once(spark, src.root, dst.root, ckpt)

    w = LakeStreamWriter(
        T.StructType(
            [T.StructField("change_op", T.StringType())]
            + list(dst.schema.fields)
            + [
                T.StructField("_bucket", T.IntegerType()),
                T.StructField("_khash", T.LongType()),
                T.StructField("_n_buckets", T.IntegerType()),
            ]
        ),
        {"path": dst.root, "sinkId": "conflict-probe"},
    )
    dst.rebucket(4)
    with pytest.raises(CommitConflictError, match="rebucket"):
        w.commit([], batchId=7)
    # fresh writer against the new layout: schema drift also blocks
    w2 = LakeStreamWriter(
        T.StructType(
            [T.StructField("change_op", T.StringType())]
            + list(dst.schema.fields)
            + [
                T.StructField("_bucket", T.IntegerType()),
                T.StructField("_khash", T.LongType()),
                T.StructField("_n_buckets", T.IntegerType()),
            ]
        ),
        {"path": dst.root, "sinkId": "conflict-probe-2"},
    )
    dst.evolve_schema([T.StructField("stars", T.LongType())], "sink drift probe")
    with pytest.raises(CommitConflictError, match="schema"):
        w2.commit([], batchId=8)


def test_plan_built_under_stale_layout_fails_in_task(registered, tmp_path):
    """prepare_lake_sink stamped _n_buckets=2; the table rebuckets to 4
    before the query starts; the pinned-4 writer must refuse the stale
    bucket ids in the task, not write them."""
    spark = registered
    stream = synth_change_stream(spark, 1_500, 200, seed=239).cache()
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=2)
    replay(src, stream, batch_lsns=1_500, max_lsn=1_499)
    dst = LakeTable.create(str(tmp_path / "dst"), spark, n_buckets=2)
    plan = prepare_lake_sink(
        spark.readStream.format("lake_changes").load(src.root), dst.root
    )
    dst.rebucket(4)
    q = (
        plan.writeStream.format("lake")
        .option("path", dst.root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="n_buckets"):
        q.awaitTermination(180)
    assert dst.version == 1  # only the rebucket commit; nothing installed


def test_sink_written_files_carry_stats_and_prune(registered, tmp_path):
    """Executor-side _footer_stat entries must be interchangeable with the
    Spark write path's: khash bounds present, stats_cols bounds usable by
    scan pruning, and compact() folds the sink's MoR debris cleanly."""
    spark = registered
    stream = synth_change_stream(spark, 2_000, 300, seed=241).cache()
    src = LakeTable.create(str(tmp_path / "src"), spark, n_buckets=2)
    replay(src, stream.where(F.col("lsn") < 1_000), batch_lsns=1_000, max_lsn=999)
    replay(src, stream.where(F.col("lsn") >= 1_000), batch_lsns=1_000,
           batch_id_prefix="b", max_lsn=1_999)
    dst = LakeTable.create(
        str(tmp_path / "dst"), spark, n_buckets=2, stats_cols=["lang"]
    )
    _mirror_once(spark, src.root, dst.root, str(tmp_path / "ckpt"))
    assert _state(dst).equals(_state(src))

    meta = dst.metadata()
    entries = [
        e
        for rel in sorted(set(meta["buckets"].values()))
        for es in json.load(open(os.path.join(dst.root, rel)))["buckets"].values()
        for e in es
    ]
    data_entries = [e for e in entries if e.get("kind") != "tomb"]
    assert data_entries
    for e in data_entries:
        assert isinstance(e["min_h"], int) and e["min_h"] <= e["max_h"]
        assert e["rows"] > 0 and e["bytes"] > 0
        assert "lang" in e.get("cols", {}), f"stats bounds missing: {e}"

    # pruning on the sink-collected bounds must stay CORRECT (never drop a
    # matching row): compare a pruned scan against the unpruned read
    langs = [r["lang"] for r in dst.read().select("lang").distinct().collect()]
    want = dst.read().where(F.col("lang") == langs[0]).count()
    got = dst.scan([("lang", "=", langs[0])]).count()
    assert got == want

    dst.compact()
    assert not dst.metadata().get("dirty")
    assert _state(dst).equals(_state(src))


def test_input_contract_validation(registered, tmp_path):
    spark = registered
    dst = LakeTable.create(str(tmp_path / "dst"), spark, n_buckets=2)
    base = [T.StructField("change_op", T.StringType())] + list(dst.schema.fields)
    tail = [
        T.StructField("_bucket", T.IntegerType()),
        T.StructField("_khash", T.LongType()),
        T.StructField("_n_buckets", T.IntegerType()),
    ]
    with pytest.raises(ValueError, match="prepare_lake_sink"):
        LakeStreamWriter(T.StructType(base), {"path": dst.root, "sinkId": "x"})
    with pytest.raises(ValueError, match="sinkId"):
        LakeStreamWriter(T.StructType(base + tail), {"path": dst.root})
    extra = T.StructType(base + [T.StructField("rogue", T.StringType())] + tail)
    with pytest.raises(ValueError, match="rogue"):
        LakeStreamWriter(extra, {"path": dst.root, "sinkId": "x"})
    missing_tbl_col = T.StructType(
        [f for f in base if f.name != "content"] + tail
    )
    with pytest.raises(ValueError, match="content"):
        LakeStreamWriter(missing_tbl_col, {"path": dst.root, "sinkId": "x"})
    with pytest.raises(KeyError, match="content"):
        prepare_lake_sink(spark.range(1).selectExpr("'r' repo"), dst.root)


def test_overwrite_mode_rejected(registered, tmp_path):
    from valentine_spark.sources.lake_batch import LakeDataSource

    dst = LakeTable.create(str(tmp_path / "dst"), registered, n_buckets=2)
    ds = LakeDataSource(options={"path": dst.root})
    with pytest.raises(ValueError, match="overwrite"):
        ds.streamWriter(T.StructType([]), overwrite=True)
