"""Type widening without data rewrite (the Iceberg type-promotion /
Delta type-widening analogue): metadata-only commits + type-log eras.

Invariants:
  * widen_column rewrites ZERO data files; every read path (read, scan,
    lookup, changes, streaming source) scans each file under the PHYSICAL
    type it was written with and casts up to the current type;
  * only lossless promotions are accepted (integral ladder, float->double,
    <=int->double, non-truncating decimal growth); key columns refuse;
  * merge upcasts a NARROWER-typed source batch and refuses a wider one
    (the upstream can switch types before or after the table widens);
  * schema drift auto-widens: a batch arriving with a wider same-named or
    renamed column widens the lake instead of overflowing a downcast;
  * the follower replays a source widen on the mirror as the same
    metadata-only op;
  * time travel serves each snapshot under ITS schema; restore to a
    pre-widen snapshot reopens the narrow type;
  * interleaving with rename/drop/add keeps every era's (name, type) pair
    straight by field id.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable, apply_batch
from valentine_spark.cdc.follow import mirror_changes

SCH_INT = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("stars", T.IntegerType()),
        T.StructField("content", T.StringType()),
    ]
)
SCH_LONG = T.StructType(
    [*SCH_INT.fields[:3], T.StructField("stars", T.LongType()), SCH_INT.fields[4]]
)


def _empty_keys(spark):
    return spark.createDataFrame([], T.StructType(SCH_INT.fields[:3]))


def _rows(n, commit="c1", prefix="p", base=0):
    return [(f"r{i % 3}", f"{prefix}{i}", commit, base + i, f"x{i}") for i in range(n)]


def _mk(spark, path, **kw):
    lake = LakeTable.create(
        str(path), spark, schema=SCH_INT, n_buckets=4, target_file_rows=100, **kw
    )
    lake.merge(
        spark.createDataFrame(_rows(40), SCH_INT), _empty_keys(spark), "b1"
    )
    return lake


def _state(lake):
    return {
        (r.repo, r.path, r.commit): (r.stars, r.content)
        for r in lake.read().collect()
    }


def _live_paths(lake):
    return {
        e["path"]
        for es in lake._bucket_files(lake.metadata()).values()
        for e in es
    }


def test_widen_is_metadata_only_and_mixes_eras(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w1")
    before = _state(lake)
    files = _live_paths(lake)
    lake.widen_column("stars", T.LongType())
    assert _live_paths(lake) == files  # zero files rewritten
    assert lake.schema["stars"].dataType == T.LongType()
    assert _state(lake) == before  # old int32 files cast up losslessly
    # post-widen writes hold values beyond int32
    big = _rows(10, commit="c2", prefix="q", base=2**40)
    lake.merge(spark.createDataFrame(big, SCH_LONG), _empty_keys(spark), "b2")
    got = _state(lake)
    assert got == {**before, **{(r[0], r[1], r[2]): (r[3], r[4]) for r in big}}
    assert lake.read().schema["stars"].dataType == T.LongType()


def test_widen_rejects_lossy_and_keys(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w2")
    lake.widen_column("stars", T.LongType())
    with pytest.raises(ValueError, match="not a lossless widening"):
        lake.widen_column("stars", T.IntegerType())  # narrowing
    with pytest.raises(ValueError, match="not a lossless widening"):
        lake.widen_column("stars", T.DoubleType())  # long->double is lossy
    with pytest.raises(ValueError, match="not a lossless widening"):
        lake.widen_column("content", T.LongType())  # cross-type
    with pytest.raises(ValueError, match="key columns"):
        lake.widen_column("repo", T.LongType())
    v = lake.version
    lake.widen_column("stars", T.LongType())  # equal type: no-op, no commit
    assert lake.version == v


def test_scan_prunes_and_lookup_across_eras(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "w3"), spark, schema=SCH_INT, n_buckets=4,
        target_file_rows=100, stats_cols=["stars"],
    )
    lake.merge(spark.createDataFrame(_rows(40), SCH_INT), _empty_keys(spark), "b1")
    lake.widen_column("stars", T.LongType())
    big = _rows(10, commit="c2", prefix="q", base=2**40)
    lake.merge(spark.createDataFrame(big, SCH_LONG), _empty_keys(spark), "b2")
    hits = lake.scan([("stars", ">=", 2**40)])
    assert hits.count() == 10
    prev = lake.prune_preview([("stars", ">=", 2**40)])
    assert prev["kept_files"] < prev["total_files"]  # int-era bounds prune
    lk = lake.lookup([("r0", "p0", "c1"), ("r0", "q0", "c2")])
    assert {r.commit: r.stars for r in lk.collect()} == {"c1": 0, "c2": 2**40}
    assert lk.schema["stars"].dataType == T.LongType()


def test_compact_folds_eras_and_time_travel_serves_old_schema(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w4")
    v_narrow = lake.version
    lake.widen_column("stars", T.LongType())
    big = _rows(10, commit="c2", prefix="q", base=2**40)
    lake.merge(spark.createDataFrame(big, SCH_LONG), _empty_keys(spark), "b2")
    want = _state(lake)
    lake.compact(min_files=1)
    assert _state(lake) == want
    old = lake.read(version=v_narrow)
    assert old.schema["stars"].dataType == T.IntegerType()
    assert old.count() == 40


def test_mor_across_widen(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "w5"), spark, schema=SCH_INT, n_buckets=4,
        target_file_rows=100, write_mode="mor",
    )
    lake.merge(spark.createDataFrame(_rows(40), SCH_INT), _empty_keys(spark), "b1")
    lake.widen_column("stars", T.LongType())
    upd = [(f"r{i % 3}", f"p{i}", "c1", 2**40 + i, f"u{i}") for i in range(10)]
    lake.merge(spark.createDataFrame(upd, SCH_LONG), _empty_keys(spark), "b2")
    got = _state(lake)
    assert got[("r0", "p0", "c1")] == (2**40, "u0")  # MoR winner, long-typed
    assert got[("r2", "p11", "c1")] == (11, "x11")  # int-era loser intact
    assert len(got) == 40


def test_changes_window_spanning_widen_is_uniformly_wide(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w6")
    v0 = lake.version
    lake.widen_column("stars", T.LongType())
    upd = [(f"r{i % 3}", f"p{i}", "c1", 2**40 + i, f"u{i}") for i in range(5)]
    lake.merge(spark.createDataFrame(upd, SCH_LONG), _empty_keys(spark), "b2")
    ch = lake.changes(v0, lake.version, include_before=True)
    assert ch.schema["stars"].dataType == T.LongType()
    assert ch.schema["_before_stars"].dataType == T.LongType()
    rows = {r.path: r for r in ch.collect()}
    assert set(rows) == {f"p{i}" for i in range(5)}
    assert all(r.change_op == "update" for r in rows.values())
    assert rows["p0"].stars == 2**40 and rows["p0"]._before_stars == 0
    # the widen alone produces NO spurious change rows
    assert lake.changes(v0, v0 + 1).count() == 0


def test_merge_upcasts_narrow_source_and_refuses_wide(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w7")
    with pytest.raises(TypeError, match="widen_column"):
        lake.merge(
            spark.createDataFrame(_rows(5, commit="c9"), SCH_LONG),
            _empty_keys(spark), "bx",
        )
    lake.widen_column("stars", T.LongType())
    # upstream still ships int: upcast transparently
    lake.merge(
        spark.createDataFrame(_rows(5, commit="c3", prefix="n", base=500), SCH_INT),
        _empty_keys(spark), "b3",
    )
    assert lake.read().where(F.col("stars").between(500, 504)).count() == 5


def test_drift_auto_widens_same_named_column(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "w8"), spark, schema=SCH_INT, n_buckets=4,
        target_file_rows=100,
    )
    ev_int = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("op_ts", T.LongType()),
            T.StructField("op", T.StringType()),
            *SCH_INT.fields,
        ]
    )
    ev_long = T.StructType([*ev_int.fields[:6], T.StructField("stars", T.LongType()), ev_int.fields[7]])
    b1 = [(i, i, "insert", f"r{i % 3}", f"p{i}", "c1", i, f"x{i}") for i in range(30)]
    apply_batch(lake, spark.createDataFrame(b1, ev_int), "b1")
    assert lake.schema["stars"].dataType == T.IntegerType()
    b2 = [
        (100 + i, 100 + i, "insert", f"r{i % 3}", f"q{i}", "c1", 2**40 + i, "w")
        for i in range(10)
    ]
    apply_batch(lake, spark.createDataFrame(b2, ev_long), "b2")
    assert lake.schema["stars"].dataType == T.LongType()
    got = _state(lake)
    assert got[("r0", "q0", "c1")] == (2**40, "w") and got[("r0", "p0", "c1")] == (0, "x0")
    assert any(
        e.get("widen_column") == ["stars", "int", "bigint"]
        for e in lake.lineage()
    )


def test_follower_replays_widen_on_mirror(spark, tmp_path):
    src = _mk(spark, tmp_path / "w9s")
    tgt = LakeTable.create(
        str(tmp_path / "w9t"), spark, schema=SCH_INT, n_buckets=4,
        target_file_rows=100,
    )
    mirror_changes(src, tgt, str(tmp_path / "w9c"))
    assert tgt.schema["stars"].dataType == T.IntegerType()
    src.widen_column("stars", T.LongType())
    big = _rows(10, commit="c2", prefix="q", base=2**40)
    src.merge(spark.createDataFrame(big, SCH_LONG), _empty_keys(spark), "b2")
    mirror_changes(src, tgt, str(tmp_path / "w9c"))
    assert tgt.schema["stars"].dataType == T.LongType()
    assert _state(tgt) == _state(src)


def test_streaming_source_across_widen(spark, tmp_path):
    from valentine_spark.streaming import register_lake_changes

    register_lake_changes(spark)
    lake = _mk(spark, tmp_path / "w10")
    ckpt = str(tmp_path / "w10ckpt")
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
    assert len(pd.concat(collected, ignore_index=True)) == 40
    collected.clear()
    lake.widen_column("stars", T.LongType())
    upd = [(f"r{i % 3}", f"p{i}", "c1", 2**40 + i, f"u{i}") for i in range(8)]
    lake.merge(spark.createDataFrame(upd, SCH_LONG), _empty_keys(spark), "b2")
    run_once()  # restarted query re-pins the widened schema
    second = pd.concat(collected, ignore_index=True)
    assert set(second.change_op) == {"update"} and len(second) == 8
    assert int(second[second.path == "p0"].stars.iloc[0]) == 2**40


def test_widen_interleaved_with_rename_and_add(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w11")
    lake.rename_column("stars", "stargazers")
    mid_sch = T.StructType(
        [*SCH_INT.fields[:3], T.StructField("stargazers", T.IntegerType()), SCH_INT.fields[4]]
    )
    mid = [(f"r{i % 3}", f"m{i}", "c1", 100 + i, "m") for i in range(10)]
    lake.merge(spark.createDataFrame(mid, mid_sch), _empty_keys(spark), "b2")
    lake.widen_column("stargazers", T.LongType())
    # a column ADDED after the widen, written narrow, then itself widened:
    # the type-log era appended at add time keeps its pre-widen files typed
    lake.evolve_schema([T.StructField("forks", T.IntegerType())], "add forks")
    add_sch = T.StructType(
        [*SCH_INT.fields[:3], T.StructField("stargazers", T.LongType()),
         SCH_INT.fields[4], T.StructField("forks", T.IntegerType())]
    )
    post = [
        (f"r{i % 3}", f"f{i}", "c1", 2**40 + i, "f", 7 + i) for i in range(10)
    ]
    lake.merge(spark.createDataFrame(post, add_sch), _empty_keys(spark), "b3")
    lake.widen_column("forks", T.LongType())
    df = lake.read()
    assert df.schema["stargazers"].dataType == T.LongType()
    assert df.schema["forks"].dataType == T.LongType()
    got = {(r.repo, r.path): (r.stargazers, r.forks) for r in df.collect()}
    assert got[("r0", "p0")] == (0, None)  # era-0 int file, pre-add
    assert got[("r0", "m0")] == (100, None)  # renamed int-era file
    assert got[("r0", "f0")] == (2**40, 7)  # forks written int, post-add
    assert len(got) == 60


def test_widen_races_concurrent_merges(spark, tmp_path):
    """A widen committing between a merge's snapshot read and its install
    must force the merge body to re-run against the widened schema (the
    rebase path's schema guard) — never land int-physical files under a
    bigint schema or lose a batch."""
    import threading

    lake = _mk(spark, tmp_path / "w14")
    barrier = threading.Barrier(2)
    errors: list = []

    def writer():
        try:
            handle = LakeTable(lake.root, spark)
            barrier.wait()
            for j in range(3):
                handle.merge(
                    spark.createDataFrame(
                        _rows(20, commit=f"w{j}", prefix=f"t{j}_"), SCH_INT
                    ),
                    _empty_keys(spark), f"race-{j}",
                )
        except Exception as e:  # noqa: BLE001 — re-raised on the driver
            errors.append(e)

    def widener():
        try:
            handle = LakeTable(lake.root, spark)
            barrier.wait()
            handle.widen_column("stars", T.LongType())
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer), threading.Thread(target=widener)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    df = lake.read()
    assert df.schema["stars"].dataType == T.LongType()
    assert df.count() == 40 + 60  # base rows + all three raced batches
    # every row readable (no int-physical-under-long-schema corruption)
    assert df.agg(F.sum("stars")).collect()[0][0] is not None


def test_decimal_widening(spark, tmp_path):
    from decimal import Decimal

    sch = T.StructType(
        [*SCH_INT.fields[:3], T.StructField("amt", T.DecimalType(8, 2)), SCH_INT.fields[4]]
    )
    lake = LakeTable.create(str(tmp_path / "w12"), spark, schema=sch, n_buckets=2)
    rows = [(f"r{i}", "p", "c", Decimal(f"{i}.25"), "x") for i in range(5)]
    lake.merge(
        spark.createDataFrame(rows, sch),
        spark.createDataFrame([], T.StructType(sch.fields[:3])), "d1",
    )
    lake.widen_column("amt", T.DecimalType(12, 4))
    assert sorted(str(r.amt) for r in lake.read().collect()) == [
        f"{i}.2500" for i in range(5)
    ]
    with pytest.raises(ValueError):  # integer digits would shrink 6 -> 4
        lake.widen_column("amt", T.DecimalType(10, 6))


def test_restore_across_widen_reopens_narrow_type(spark, tmp_path):
    lake = _mk(spark, tmp_path / "w13")
    v_narrow = lake.version
    lake.widen_column("stars", T.LongType())
    big = _rows(10, commit="c2", prefix="q", base=2**40)
    lake.merge(spark.createDataFrame(big, SCH_LONG), _empty_keys(spark), "b2")
    lake.restore(v_narrow)
    assert lake.schema["stars"].dataType == T.IntegerType()
    # the abandoned widen's type log must NOT survive the restore: it
    # would stamp post-restore narrow files with the wide physical type
    assert lake.metadata().get("type_log") is None
    assert lake.read().count() == 40
    lake.merge(
        spark.createDataFrame(_rows(5, commit="c3", prefix="z"), SCH_INT),
        _empty_keys(spark), "b3",
    )
    assert lake.read().count() == 45
    assert lake.read().schema["stars"].dataType == T.IntegerType()
    # widening AGAIN after the restore starts a fresh, correct type log:
    # all live files (pre-restore and post-restore) really are int32
    lake.widen_column("stars", T.LongType())
    lake.merge(
        spark.createDataFrame(
            _rows(5, commit="c4", prefix="y", base=2**40), SCH_LONG
        ),
        _empty_keys(spark), "b4",
    )
    got = _state(lake)
    assert got[("r0", "z0", "c3")] == (0, "x0")
    assert got[("r0", "y0", "c4")] == (2**40, "x0")
    assert len(got) == 50
