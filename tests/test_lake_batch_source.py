"""``lake`` batch Python Data Source (sources/lake_batch.py) + the batch
face of ``lake_changes`` (streaming/lake_source.py).

Core contracts under test:
  * ``spark.read.format("lake").load(root)`` is row-equal to
    ``LakeTable.read()`` — on clean (COW), dirty (merge-on-read),
    schema-evolved (rename + widen + defaults), branched, and
    time-traveled state;
  * filter pushdown prunes clean data files at the manifest and never
    changes results (Spark re-applies every filter);
  * ``spark.read.format("lake_changes").option("fromVersion", N)`` equals
    ``LakeTable.changes(N, to)`` including before-images.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import EqualTo, In

from valentine_spark.cdc import LakeTable, replay, synth_change_stream
from valentine_spark.sources.lake_batch import (
    LakeSnapshotPushdownReader,
    register_lake,
)
from valentine_spark.streaming.lake_source import register_lake_changes


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_frame_equal(got, want, label):
    g, w = _canon(got.toPandas()), _canon(want.toPandas())
    assert g.equals(w), f"{label}: {len(g)} rows vs expected {len(w)}"


def _table_read(lake, version=None):
    from valentine_spark.cdc.lake import BUCKET_COL

    return lake.read(version=version).drop(BUCKET_COL)


def test_snapshot_read_equals_table_read_cow_and_time_travel(spark, tmp_path):
    register_lake(spark)
    stream = synth_change_stream(spark, 4_000, 700, seed=211, delete_fraction=0.2).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=4)
    replay(lake, stream.where(F.col("lsn") < 2_000), batch_lsns=1_000, max_lsn=1_999)
    v_mid = lake.version
    replay(
        lake, stream.where(F.col("lsn") >= 2_000),
        batch_lsns=1_000, batch_id_prefix="tail", max_lsn=3_999,
    )

    got = spark.read.format("lake").load(lake.root)
    _assert_frame_equal(got, _table_read(lake), "head snapshot")
    got_mid = spark.read.format("lake").option("version", v_mid).load(lake.root)
    _assert_frame_equal(got_mid, _table_read(lake, version=v_mid), "time travel")


def test_snapshot_read_resolves_dirty_mor_buckets(spark, tmp_path):
    register_lake(spark)
    stream = synth_change_stream(spark, 4_000, 500, seed=223, delete_fraction=0.25).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=4, write_mode="mor")
    replay(lake, stream, batch_lsns=1_000, max_lsn=3_999)
    assert lake.metadata().get("dirty"), "fixture must exercise dirty buckets"
    got = spark.read.format("lake").load(lake.root)
    _assert_frame_equal(got, _table_read(lake), "dirty MoR snapshot")


def test_snapshot_read_across_rename_widen_defaults(spark, tmp_path):
    """Era machinery end-to-end: files written under the OLD name/type and
    files predating an added-with-default column must read identically to
    LakeTable.read through the data source's executor path."""
    register_lake(spark)
    stream = synth_change_stream(spark, 3_000, 400, seed=227).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_500), batch_lsns=750, max_lsn=1_499)
    lake.rename_column("lang", "language")
    lake.evolve_schema(
        [T.StructField("stars", T.LongType())], defaults={"stars": 7}, note="t"
    )
    replay(
        lake, stream.where(F.col("lsn") >= 1_500).withColumnRenamed("lang", "language"),
        batch_lsns=750, batch_id_prefix="tail", max_lsn=2_999,
    )
    got = spark.read.format("lake").load(lake.root)
    assert "language" in got.columns and "stars" in got.columns
    _assert_frame_equal(got, _table_read(lake), "evolved snapshot")
    # pre-add files serve the initial default, not NULL
    assert got.where(F.col("stars").isNull()).count() == 0


def test_snapshot_read_branch_option(spark, tmp_path):
    register_lake(spark)
    stream = synth_change_stream(spark, 2_000, 300, seed=229).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_000), batch_lsns=500, max_lsn=999)
    lake.create_branch("audit")
    br = lake.branch("audit")
    replay(
        br, stream.where(F.col("lsn") >= 1_000),
        batch_lsns=500, batch_id_prefix="br", max_lsn=1_999,
    )
    got_main = spark.read.format("lake").load(lake.root)
    _assert_frame_equal(got_main, _table_read(lake), "main unchanged")
    got_br = spark.read.format("lake").option("branch", "audit").load(lake.root)
    _assert_frame_equal(got_br, _table_read(br), "branch head")
    assert got_br.count() != got_main.count()


def test_filter_pushdown_prunes_files_and_stays_exact(spark, tmp_path):
    register_lake(spark)
    stream = synth_change_stream(spark, 4_000, 800, seed=233).cache()
    lake = LakeTable.create(
        str(tmp_path / "l"), spark, n_buckets=2, stats_cols=["lang"],
        target_file_rows=100,
    )
    replay(lake, stream, batch_lsns=1_000, max_lsn=3_999)
    lake.compact(sort_cols=["lang"])  # cluster so bounds discriminate

    langs = [r[0] for r in lake.read().select("lang").distinct().collect()]
    target = sorted(langs)[0]

    # unit level: pushFilters must shrink the partition plan
    meta = lake.metadata()
    schema = lake.schema
    base = LakeSnapshotPushdownReader(schema, {"path": lake.root}, meta)
    all_parts = base.partitions()
    pruned_reader = LakeSnapshotPushdownReader(schema, {"path": lake.root}, meta)
    residual = list(pruned_reader.pushFilters([EqualTo(("lang",), target)]))
    assert len(residual) == 1, "every filter must go back to Spark"
    kept_parts = pruned_reader.partitions()
    assert 0 < len(kept_parts) < len(all_parts), (
        f"pruning must drop files: kept {len(kept_parts)} of {len(all_parts)}"
    )

    # IN pruning keeps the union of the values' files
    in_reader = LakeSnapshotPushdownReader(schema, {"path": lake.root}, meta)
    list(in_reader.pushFilters([In(("lang",), (target, sorted(langs)[-1]))]))
    assert len(kept_parts) <= len(in_reader.partitions()) < len(all_parts)

    # end-to-end: result identical to the unpruned read's filter
    got = spark.read.format("lake").load(lake.root).where(F.col("lang") == target)
    want = _table_read(lake).where(F.col("lang") == target)
    _assert_frame_equal(got, want, "pushdown-filtered read")

    # opting out of pushdown still answers correctly
    got_plain = (
        spark.read.format("lake").option("pushdown", "false")
        .load(lake.root).where(F.col("lang") == target)
    )
    _assert_frame_equal(got_plain, want, "pushdown disabled")


def test_filter_pushdown_never_prunes_dirty_mor_buckets(spark, tmp_path):
    """Stats pruning over multi-version state could resurrect an older
    matching version of a key whose current version doesn't match — dirty
    buckets must plan whole regardless of filters."""
    register_lake(spark)
    stream = synth_change_stream(spark, 3_000, 300, seed=239).cache()
    lake = LakeTable.create(
        str(tmp_path / "l"), spark, n_buckets=2, write_mode="mor",
        stats_cols=["lang"],
    )
    replay(lake, stream, batch_lsns=1_000, max_lsn=2_999)
    assert lake.metadata().get("dirty")
    meta = lake.metadata()
    r = LakeSnapshotPushdownReader(lake.schema, {"path": lake.root}, meta)
    list(r.pushFilters([EqualTo(("lang",), "no-such-language")]))
    parts = r.partitions()
    dirty_parts = [p for p in parts if p.dirty]
    assert len(dirty_parts) == len(meta["dirty"]), "dirty buckets plan whole"
    got = (
        spark.read.format("lake").load(lake.root)
        .where(F.col("lang") == "no-such-language")
    )
    assert got.count() == 0


def test_empty_partition_plans_return_empty_results(spark, tmp_path):
    """Spark substitutes a single None partition when partitions() returns
    an empty list — every zero-task plan must answer with zero ROWS, not a
    worker crash: a freshly created lake, a pushdown filter that prunes
    every clean file, and an empty changelog window (fromVersion == head)."""
    register_lake(spark)
    register_lake_changes(spark)

    # 1. empty lake: no buckets committed yet
    empty = LakeTable.create(str(tmp_path / "empty"), spark, n_buckets=2)
    assert spark.read.format("lake").load(empty.root).count() == 0

    # 2. all-clean compacted table + impossible predicate: pushdown prunes
    #    every file through a REAL Spark query (not just unit partitions())
    stream = synth_change_stream(spark, 2_000, 300, seed=251).cache()
    lake = LakeTable.create(
        str(tmp_path / "l"), spark, n_buckets=2, stats_cols=["lang"]
    )
    replay(lake, stream, batch_lsns=1_000, max_lsn=1_999)
    lake.compact(sort_cols=["lang"])
    assert not lake.metadata().get("dirty")
    pruned = (
        spark.read.format("lake").load(lake.root)
        .where(F.col("lang") == "￿-no-such-lang")
    )
    assert pruned.count() == 0

    # 3. empty change window: the canonical consumer poll with nothing new
    head = lake.version
    assert (
        spark.read.format("lake_changes")
        .option("fromVersion", head).option("toVersion", head)
        .load(lake.root).count() == 0
    )


def test_batch_changes_window_equals_changes(spark, tmp_path):
    register_lake_changes(spark)
    stream = synth_change_stream(spark, 4_000, 600, seed=241, delete_fraction=0.2).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=4)
    replay(lake, stream.where(F.col("lsn") < 2_000), batch_lsns=1_000, max_lsn=1_999)
    v_mid = lake.version
    replay(
        lake, stream.where(F.col("lsn") >= 2_000),
        batch_lsns=1_000, batch_id_prefix="tail", max_lsn=3_999,
    )
    v_head = lake.version

    got = (
        spark.read.format("lake_changes")
        .option("fromVersion", v_mid).option("toVersion", v_head)
        .load(lake.root)
    )
    _assert_frame_equal(got, lake.changes(v_mid, v_head), "interior window")

    # default toVersion = the snapshot schema() resolved (head)
    got_head = (
        spark.read.format("lake_changes").option("fromVersion", 0).load(lake.root)
    )
    _assert_frame_equal(got_head, lake.changes(0, v_head), "full history")

    # before-images
    got_b = (
        spark.read.format("lake_changes")
        .option("fromVersion", v_mid).option("includeBefore", "true")
        .load(lake.root)
    )
    _assert_frame_equal(
        got_b, lake.changes(v_mid, v_head, include_before=True), "before images"
    )

    with pytest.raises(Exception, match="fromVersion"):
        spark.read.format("lake_changes").load(lake.root).collect()


def test_batch_changes_expired_window_fails_loudly(spark, tmp_path):
    """A batch CDF window whose fromVersion snapshot was expired by
    retention must fail with the actionable retention message (same
    contract the streaming restart pins in test_lake_source) — never
    serve a silently wrong diff."""
    register_lake_changes(spark)
    stream = synth_change_stream(spark, 2_000, 400, seed=311).cache()
    lake = LakeTable.create(str(tmp_path / "l"), spark, n_buckets=2)
    replay(lake, stream.where(F.col("lsn") < 1_000), batch_lsns=500, max_lsn=999)
    v_old = lake.version
    replay(
        lake, stream.where(F.col("lsn") >= 1_000),
        batch_lsns=500, batch_id_prefix="tail", max_lsn=1_999,
    )
    lake.expire_snapshots(keep_last=1)

    with pytest.raises(Exception, match="expired by retention"):
        (
            spark.read.format("lake_changes")
            .option("fromVersion", v_old)
            .load(lake.root)
            .collect()
        )
