"""Rename/drop schema evolution without data rewrite (the Iceberg
field-id analogue): metadata-only commits + era-mapped reads.

Invariants:
  * rename_column / drop_column rewrite ZERO data files; every read path
    (read, scan, lookup, changes, point ops, streaming source) maps each
    file's PHYSICAL names to the current schema by the era its commit seq
    falls in;
  * drop-then-re-add gets a fresh field id — stale same-named physical
    bytes never resurrect;
  * time travel serves each snapshot under ITS schema;
  * changes() windows spanning a rename carry values under the TO-name
    with no spurious update rows;
  * write paths (merge, mutate, merge_into, compact, rebucket) work on
    multi-era tables and emit current-named files;
  * key columns are not renamable/droppable.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable, apply_batch, synth_change_stream


def _mk(spark, path, **kw):
    lake = LakeTable.create(str(path), spark, n_buckets=4, target_file_rows=200, **kw)
    stream = synth_change_stream(spark, 2000, 1200, seed=3)
    apply_batch(lake, stream, "b1")
    return lake


def _state(lake, payload=("lang", "content")):
    return {
        tuple(r[:3]): tuple(r[c] for c in payload) for r in lake.read().collect()
    }


def _live_paths(lake):
    return {
        e["path"]
        for es in lake._bucket_files(lake.metadata()).values()
        for e in es
    }


def test_rename_is_metadata_only_and_preserves_state(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r1")
    before = _state(lake)
    files_before = _live_paths(lake)
    lake.rename_column("lang", "language")
    assert _live_paths(lake) == files_before  # zero files rewritten
    after = _state(lake, payload=("language", "content"))
    assert after == before
    assert "lang" not in lake.read().columns


def test_merge_after_rename_unions_eras(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r2")
    before = _state(lake)
    lake.rename_column("lang", "language")
    s2 = synth_change_stream(spark, 800, 1200, seed=9).withColumnRenamed(
        "lang", "language"
    )
    apply_batch(lake, s2, "b2")
    got = _state(lake, payload=("language", "content"))
    # oracle: replay both batches on a fresh un-renamed table
    oracle = LakeTable.create(str(tmp_path / "r2o"), spark, n_buckets=4,
                              target_file_rows=200)
    apply_batch(oracle, synth_change_stream(spark, 2000, 1200, seed=3), "b1")
    apply_batch(oracle, synth_change_stream(spark, 800, 1200, seed=9), "b2")
    assert got == _state(oracle)
    # compaction folds both eras into current-named files and stays equal
    lake.compact(min_files=1)
    assert _state(lake, payload=("language", "content")) == got


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r3")
    keys = set(_state(lake))
    lake.drop_column("lang")
    assert "lang" not in lake.read().columns
    lake.evolve_schema([T.StructField("lang", T.StringType())], "re-add")
    vals = {r[0] for r in lake.read().select("lang").distinct().collect()}
    assert vals == {None}
    assert set(_state(lake, payload=("content",)).keys()) == keys


def test_time_travel_serves_each_snapshot_under_its_schema(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r4")
    v1 = lake.version
    before = _state(lake)
    lake.rename_column("lang", "language")
    old = lake.read(version=v1)
    assert "lang" in old.columns and "language" not in old.columns
    got = {tuple(r[:3]): (r["lang"], r["content"]) for r in old.collect()}
    assert got == before


def test_scan_stats_cols_follow_rename(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r5", stats_cols=["lang"])
    want = {k for k, v in _state(lake).items() if v[0] == "rust"}
    lake.rename_column("lang", "language")
    assert lake.metadata()["stats_cols"] == ["language"]
    got = {tuple(r[:3]) for r in lake.scan([("language", "=", "rust")]).collect()}
    assert got == want  # pre-rename bounds stop pruning but stay exact
    # post-rename sorted compaction records bounds under the NEW name and
    # pruning resumes
    lake.compact(min_files=1, sort_cols=["language"])
    pv = lake.prune_preview([("language", "=", "rust")])
    assert pv["kept_files"] < pv["total_files"]
    got2 = {tuple(r[:3]) for r in lake.scan([("language", "=", "rust")]).collect()}
    assert got2 == want


def test_changes_window_spanning_rename(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r6")
    v1 = lake.version
    lake.rename_column("lang", "language")
    # rename alone: ZERO change rows (no spurious updates from the new name)
    assert lake.changes(v1).count() == 0
    s2 = synth_change_stream(spark, 500, 1200, seed=11).withColumnRenamed(
        "lang", "language"
    )
    apply_batch(lake, s2, "b2")
    ch = lake.changes(v1)
    assert "language" in ch.columns and "lang" not in ch.columns
    # the changelog applied to the pre-rename image reproduces the current
    upserts = {
        tuple(r[:3]): (r["language"], r["content"])
        for r in ch.where(F.col("change_op") != "delete")
        .select("repo", "path", "commit", "language", "content")
        .collect()
    }
    deletes = {
        tuple(r[:3])
        for r in ch.where(F.col("change_op") == "delete")
        .select("repo", "path", "commit")
        .collect()
    }
    base = {
        tuple(r[:3]): (r["lang"], r["content"])
        for r in lake.read(version=v1).collect()
    }
    replayed = {k: v for k, v in base.items() if k not in deletes}
    replayed.update(upserts)
    assert replayed == _state(lake, payload=("language", "content"))


def test_mor_dirty_buckets_across_rename(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "r7"), spark, n_buckets=4, target_file_rows=200,
        write_mode="mor",
    )
    stream = synth_change_stream(spark, 2000, 1200, seed=3)
    apply_batch(lake, stream.where(F.col("lsn") < 1000), "b1")
    lake.rename_column("lang", "language")
    s2 = stream.where(F.col("lsn") >= 1000).withColumnRenamed("lang", "language")
    apply_batch(lake, s2, "b2")
    assert lake.metadata().get("dirty"), "fixture must hold multi-version state"
    got = _state(lake, payload=("language", "content"))
    oracle = LakeTable.create(str(tmp_path / "r7o"), spark, n_buckets=4,
                              target_file_rows=200)
    apply_batch(oracle, stream, "all")
    assert got == _state(oracle)


def test_lookup_and_mutations_on_multi_era_table(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r8")
    before = _state(lake)
    lake.rename_column("content", "body")
    keys = sorted(before)[:5]
    got = {
        tuple(r[:3]): r["body"] for r in lake.lookup([tuple(k) for k in keys]).collect()
    }
    assert got == {k: before[k][1] for k in keys}
    # predicate update on the RENAMED column over old-era files
    lake.update_where([("lang", "=", "rust")], {"body": F.lit("[x]")})
    for k, v in _state(lake, payload=("lang", "body")).items():
        assert v[1] == ("[x]" if v[0] == "rust" else before[k][1])
    # merge_into touching old-era files
    src = spark.createDataFrame(
        [(*keys[0], "zz")], "repo string, path string, commit string, body string"
    )
    lake.merge_into(src).when_matched_update({"body": F.col("s.body")}).execute()
    assert _state(lake, payload=("body",))[keys[0]] == ("zz",)


def test_streaming_source_across_rename(spark, tmp_path):
    from valentine_spark.streaming.lake_source import register_lake_changes

    register_lake_changes(spark)
    lake = _mk(spark, tmp_path / "r9")
    lake.rename_column("lang", "language")
    s2 = synth_change_stream(spark, 500, 1200, seed=11).withColumnRenamed(
        "lang", "language"
    )
    apply_batch(lake, s2, "b2")
    q = (
        spark.readStream.format("lake_changes")
        .option("startingVersion", 0)
        .load(str(tmp_path / "r9"))
        .writeStream.format("memory")
        .queryName("rename_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt9"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT repo, path, commit, language, content FROM rename_stream "
        "WHERE change_op <> 'delete'"
    )
    # the stream's cumulative upserts minus deletes == batch changes() image
    want = lake.changes(0).where(F.col("change_op") != "delete").select(
        "repo", "path", "commit", "language", "content"
    )
    assert {tuple(r) for r in got.collect()} >= {tuple(r) for r in want.collect()}


def test_key_columns_protected(spark, tmp_path):
    lake = _mk(spark, tmp_path / "r10")
    with pytest.raises(ValueError):
        lake.rename_column("repo", "repository")
    with pytest.raises(ValueError):
        lake.drop_column("path")
    with pytest.raises(KeyError):
        lake.rename_column("nope", "x")
    with pytest.raises(ValueError):
        lake.rename_column("lang", "content")  # collision


def test_three_step_swap_rename(spark, tmp_path):
    """Swapping two column names (a->tmp, b->a, tmp->b) leaves old files
    whose PHYSICAL 'lang' holds the data now named 'content' and vice
    versa; the era colmap must cross-project them (types travel with the
    field id, so the cross-typed read schema is still correct)."""
    lake = _mk(spark, tmp_path / "sw")
    before = _state(lake)
    lake.rename_column("lang", "tmp_swap")
    lake.rename_column("content", "lang")
    lake.rename_column("tmp_swap", "content")
    # now: column 'content' holds the OLD lang values, 'lang' the old content
    after = {
        tuple(r[:3]): (r["content"], r["lang"])
        for r in lake.read().collect()
    }
    assert after == before
    # and a write after the swap unions both eras correctly
    s2 = (
        synth_change_stream(spark, 300, 1200, seed=21)
        .withColumnRenamed("lang", "old_lang")
        .withColumnRenamed("content", "lang")
        .withColumnRenamed("old_lang", "content")
    )
    apply_batch(lake, s2, "b2")
    assert lake.read().count() >= len(before)


def test_swap_rename_bounds_not_confused_by_reused_name(spark, tmp_path):
    """Rename-into-reused-name hazard (stats bounds are manifest-keyed by
    PHYSICAL name): after swapping lang<->content, a predicate on the new
    'lang' (physically old content data, values 'zz-...') must not be
    pruned against the STALE 'lang' bounds (old lang values 'cpp'..'ts').
    Pre-fix, scan() silently dropped every matching file and delete_where
    silently skipped the rows."""
    lake = LakeTable.create(
        str(tmp_path / "sb"), spark, n_buckets=2, target_file_rows=100,
        stats_cols=["lang", "content"],
    )
    stream = synth_change_stream(spark, 1000, 600, seed=13).withColumn(
        "content", F.concat(F.lit("zz-"), F.col("path"))
    )
    apply_batch(lake, stream, "b1")
    before = _state(lake)
    lake.rename_column("lang", "tmp_swap")
    lake.rename_column("content", "lang")
    lake.rename_column("tmp_swap", "content")
    # predicate value 'zz-...' is far outside the stale 'lang' bounds
    probe = next(v[1] for v in before.values())  # an original content value
    assert probe.startswith("zz-")
    want = {k for k, v in before.items() if v[1] == probe}
    got = {tuple(r[:3]) for r in lake.scan([("lang", "=", probe)]).collect()}
    assert got == want and want  # scan exact despite the stale bounds
    # the mutation path shares the same pruning: must rewrite, not skip
    res = lake.update_where([("lang", "=", probe)], {"content": F.lit("[hit]")})
    assert res["rows_matched"] == len(want)
    got2 = {
        tuple(r[:3])
        for r in lake.read().where(F.col("content") == "[hit]").collect()
    }
    assert got2 == want
