"""Column defaults for added columns (the Iceberg v3 initial-default /
write-default analogue, one value serving both roles).

Invariants:
  * evolve_schema(defaults=...) is metadata-only: files written BEFORE the
    add read the default instead of NULL; files written after keep their
    physical values including explicit NULLs;
  * a changes() window crossing the add emits ZERO spurious rows (both
    sides align on the default);
  * ingest paths fill a batch that omits the column with the default
    (apply_batch, merge_into INSERT);
  * the default is keyed by field id: it follows renames and dies with a
    drop (a same-named re-add starts clean);
  * the follower propagates the default to the mirror so untouched rows
    agree on both sides;
  * the streaming changelog source serves the default for pre-add files;
  * compact materializes defaults physically without changing state;
  * restore carries the defaults of the restored snapshot.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable, apply_batch
from valentine_spark.cdc.follow import mirror_changes

SCH = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
SCH_LIC = T.StructType([*SCH.fields, T.StructField("license", T.StringType())])


def _empty_keys(spark):
    return spark.createDataFrame([], T.StructType(SCH.fields[:3]))


def _rows(n, commit="c1", prefix="p"):
    return [(f"r{i % 3}", f"{prefix}{i}", commit, "py", f"x{i}") for i in range(n)]


def _mk(spark, path, **kw):
    lake = LakeTable.create(
        str(path), spark, schema=SCH, n_buckets=2, target_file_rows=50, **kw
    )
    lake.merge(spark.createDataFrame(_rows(30), SCH), _empty_keys(spark), "b1")
    return lake


def _live_paths(lake):
    return {
        e["path"]
        for es in lake._bucket_files(lake.metadata()).values()
        for e in es
    }


def test_initial_default_is_metadata_only(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d1")
    files = _live_paths(lake)
    v_pre = lake.version
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    assert _live_paths(lake) == files  # zero files rewritten
    assert lake.column_defaults() == {"license": "unknown"}
    vals = {r.path: r.license for r in lake.read().collect()}
    assert len(vals) == 30 and set(vals.values()) == {"unknown"}
    # metadata-only change => zero changelog rows
    assert lake.changes(v_pre, lake.version).count() == 0
    # time travel BELOW the add serves the pre-add schema
    assert "license" not in lake.read(version=v_pre).columns


def test_post_add_values_and_explicit_nulls_respected(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d2")
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    lake.merge(
        spark.createDataFrame(
            [("r0", "q0", "c1", "py", "y0", "mit"),
             ("r0", "q1", "c1", "py", "y1", None)], SCH_LIC,
        ),
        _empty_keys(spark), "b2",
    )
    vals = {r.path: r.license for r in lake.read().collect()}
    assert vals["q0"] == "mit"
    assert vals["q1"] is None  # explicit NULL is NOT the default
    assert vals["p0"] == "unknown"


def test_apply_batch_write_default_fill(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d3")
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    ev_sch = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op_ts", T.LongType()),
            T.StructField("op", T.StringType()),
            *SCH.fields,
        ]
    )
    apply_batch(
        lake,
        spark.createDataFrame([(1, 1, "insert", "r1", "z0", "c1", "go", "n")], ev_sch),
        "b2",
    )
    vals = {r.path: r.license for r in lake.read().collect()}
    assert vals["z0"] == "unknown"  # batch omitted the column


def test_merge_into_insert_uses_default(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d4")
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    src = spark.createDataFrame([("r8", "m0", "c1", "rs", "src")], SCH)
    lake.merge_into(src).when_not_matched_insert().execute(batch_id="mi1")
    vals = {r.path: r.license for r in lake.read().collect()}
    assert vals["m0"] == "unknown"


def test_default_follows_rename_and_dies_with_drop(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d5")
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    lake.rename_column("license", "licence")
    assert lake.column_defaults() == {"licence": "unknown"}
    assert {r.path: r.licence for r in lake.read().collect()}["p0"] == "unknown"
    lake.drop_column("licence")
    assert lake.column_defaults() == {}
    lake.evolve_schema([T.StructField("licence", T.StringType())], "re-add")
    got = {r[0] for r in lake.read().select("licence").distinct().collect()}
    assert got == {None}  # re-add starts clean, no resurrection


def test_compact_materializes_without_state_change(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d6")
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    want = {(r.repo, r.path): (r.content, r.license) for r in lake.read().collect()}
    lake.compact(min_files=1)
    assert {
        (r.repo, r.path): (r.content, r.license) for r in lake.read().collect()
    } == want


def test_follower_propagates_default(spark, tmp_path):
    src = _mk(spark, tmp_path / "d7s")
    tgt = LakeTable.create(
        str(tmp_path / "d7t"), spark, schema=SCH, n_buckets=2, target_file_rows=50
    )
    mirror_changes(src, tgt, str(tmp_path / "d7c"))
    src.evolve_schema(
        [T.StructField("stars", T.IntegerType())], "add", defaults={"stars": 7}
    )
    src.merge(
        spark.createDataFrame(
            [("r9", "n0", "c1", "py", "n", 3)],
            T.StructType([*SCH.fields, T.StructField("stars", T.IntegerType())]),
        ),
        _empty_keys(spark), "a2",
    )
    mirror_changes(src, tgt, str(tmp_path / "d7c"))
    s = {(r.repo, r.path): r.stars for r in src.read().collect()}
    t = {(r.repo, r.path): r.stars for r in tgt.read().collect()}
    assert s == t
    assert t[("r0", "p0")] == 7 and t[("r9", "n0")] == 3
    assert tgt.column_defaults() == {"stars": 7}


def test_streaming_source_serves_default(spark, tmp_path):
    from valentine_spark.streaming import register_lake_changes

    register_lake_changes(spark)
    lake = _mk(spark, tmp_path / "d8")
    lake.evolve_schema(
        [T.StructField("stars", T.IntegerType())], "add", defaults={"stars": 7}
    )
    lake.merge(
        spark.createDataFrame(
            [("r0", "p0", "c1", "py", "upd", 9), ("r9", "n0", "c1", "go", "n", None)],
            T.StructType([*SCH.fields, T.StructField("stars", T.IntegerType())]),
        ),
        _empty_keys(spark), "b2",
    )
    collected = []
    q = (
        spark.readStream.format("lake_changes")
        .load(lake.root)
        .writeStream.foreachBatch(lambda df, bid: collected.append(df.toPandas()))
        .option("checkpointLocation", str(tmp_path / "d8ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    allr = pd.concat(collected, ignore_index=True)
    assert int(allr[allr.path == "p1"].stars.iloc[0]) == 7  # pre-add file
    assert int(allr[allr.path == "p0"].stars.iloc[0]) == 9
    assert pd.isna(allr[allr.path == "n0"].stars.iloc[0])


def test_restore_carries_snapshot_defaults(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d9")
    v_pre = lake.version
    lake.evolve_schema(
        [T.StructField("license", T.StringType())], "add",
        defaults={"license": "unknown"},
    )
    lake.restore(v_pre)
    assert lake.column_defaults() == {}
    assert "license" not in lake.read().columns
    lake.restore(v_pre + 1)  # forward again to the defaulted snapshot
    assert lake.column_defaults() == {"license": "unknown"}
    assert {r.path: r.license for r in lake.read().collect()}["p0"] == "unknown"


def test_defaults_validation(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d10")
    with pytest.raises(KeyError, match="not being added"):
        lake.evolve_schema(
            [T.StructField("a", T.StringType())], "x", defaults={"b": 1}
        )
    # non-scalar defaults would commit fine and then poison every read —
    # rejected before the metadata commit
    for bad in (object(), {"k": 1}, [1, 2], None):
        with pytest.raises(TypeError, match="scalar literal"):
            lake.evolve_schema(
                [T.StructField("a", T.StringType())], "x", defaults={"a": bad}
            )
    # wrong-typed scalar: the ANSI castability probe raises at evolve
    # time, not on the first read after the commit lands
    with pytest.raises(Exception, match="(?i)cast|number"):
        lake.evolve_schema(
            [T.StructField("n", T.IntegerType())], "x", defaults={"n": "seven"}
        )
    assert "n" not in {f.name for f in lake.schema.fields}  # no commit landed


def test_default_cannot_attach_retroactively_but_replay_skips(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d11")
    lake.evolve_schema([T.StructField("license", T.StringType())], "add")
    # the column exists without a default: attaching one later must FAIL
    # loudly (old files would keep serving NULL), not silently no-op
    with pytest.raises(ValueError, match="retroactively"):
        lake.evolve_schema(
            [T.StructField("license", T.StringType())], "again",
            defaults={"license": "unknown"},
        )
    # idempotent crash-replay of the SAME defaulted evolution skips clean
    lake.evolve_schema(
        [T.StructField("stars", T.IntegerType())], "add", defaults={"stars": 7}
    )
    v = lake.version
    lake.evolve_schema(
        [T.StructField("stars", T.IntegerType())], "add", defaults={"stars": 7}
    )
    assert lake.version == v  # replay: no new commit, no error


def test_streaming_drop_does_not_resurrect_default(spark, tmp_path):
    """A column dropped mid-stream must NOT have its default fabricated
    into post-drop files' change rows: defaults resolve per batch from the
    window's end-version meta, where the drop already removed the id.
    Models a LONG-RUNNING query by driving the reader directly with its
    schema pinned to the pre-drop snapshot (a restart re-pins and drops
    the column entirely — that path is trivially safe)."""
    from valentine_spark.streaming.lake_source import LakeChangesStreamReader

    lake = _mk(spark, tmp_path / "d12")
    lake.evolve_schema(
        [T.StructField("stars", T.IntegerType())], "add", defaults={"stars": 7}
    )
    pinned_meta = lake.metadata()
    pinned_schema = T.StructType(
        [T.StructField("change_op", T.StringType(), False)]
        + list(lake.schema.fields)
    )
    reader = LakeChangesStreamReader(
        pinned_schema, {"path": lake.root, "startingversion": "latest"},
        schema_meta=pinned_meta,
    )
    v0 = lake.version
    lake.drop_column("stars")
    lake.merge(
        spark.createDataFrame([("r9", "n0", "c1", "go", "post-drop")], SCH),
        _empty_keys(spark), "b2",
    )
    parts = reader.partitions({"version": v0}, {"version": lake.version})
    rows = pd.concat(
        [b.to_pandas() for p in parts for b in reader.read(p)],
        ignore_index=True,
    )
    row = rows[rows.path == "n0"]
    assert len(row) == 1
    assert pd.isna(row.stars.iloc[0])  # NOT the dead column's default 7
