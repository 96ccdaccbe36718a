"""remove_orphan_files: crash-debris GC that expires NO snapshot (the
Iceberg remove_orphan_files analogue — expire_snapshots with every
version retained).

Invariants:
  * stray data files (a write whose commit never installed) are deleted;
  * every referenced file of every retained snapshot survives — full
    time-travel history stays readable afterwards;
  * files referenced only by a BRANCH head survive a main-handle sweep;
  * min_age_seconds spares young unreferenced files (the in-flight
    commit guard).
"""

import os
import time

from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable

SCH = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def _empty_keys(spark):
    return spark.createDataFrame([], T.StructType(SCH.fields[:3]))


def _rows(n, commit="c1", prefix="p"):
    return [(f"r{i % 3}", f"{prefix}{i}", commit, "py", f"x{i}") for i in range(n)]


def _mk(spark, path):
    lake = LakeTable.create(str(path), spark, schema=SCH, n_buckets=2, target_file_rows=50)
    lake.merge(spark.createDataFrame(_rows(30), SCH), _empty_keys(spark), "b1")
    lake.merge(
        spark.createDataFrame(_rows(10, commit="c2", prefix="q"), SCH),
        _empty_keys(spark), "b2",
    )
    return lake


def _plant_orphan(lake, spark, age_back=7200.0):
    """Simulate a crashed commit: parquet staged under data/ that no
    manifest references, backdated past the retention threshold."""
    stray_dir = os.path.join(lake.root, "data", "c-orphan", "_bucket=0")
    os.makedirs(stray_dir, exist_ok=True)
    spark.createDataFrame(_rows(5, commit="cx"), SCH).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stray_dir)
    old = time.time() - age_back
    strays = []
    for base, _dirs, files in os.walk(os.path.join(lake.root, "data", "c-orphan")):
        for f in files:
            p = os.path.join(base, f)
            os.utime(p, (old, old))
            if f.endswith(".parquet"):
                strays.append(p)
    assert strays
    return strays


def test_removes_stray_keeps_history(spark, tmp_path):
    lake = _mk(spark, tmp_path / "o1")
    strays = _plant_orphan(lake, spark)
    versions = list(range(1, lake.version + 1))
    states = {v: lake.read(version=v).count() for v in versions}
    res = lake.remove_orphan_files(min_age_seconds=3600)
    assert res["removed_snapshots"] == 0
    assert res["removed_files"] >= len(strays)
    assert not any(os.path.exists(p) for p in strays)
    # FULL history still readable — no snapshot expired, no live file lost
    for v in versions:
        assert lake.read(version=v).count() == states[v]


def test_min_age_spares_young_files(spark, tmp_path):
    lake = _mk(spark, tmp_path / "o2")
    strays = _plant_orphan(lake, spark, age_back=0.0)  # freshly written
    res = lake.remove_orphan_files(min_age_seconds=3600)
    assert res["removed_files"] == 0
    assert all(os.path.exists(p) for p in strays)
    # a later sweep past the threshold collects them
    res2 = lake.remove_orphan_files(min_age_seconds=0)
    assert res2["removed_files"] >= len(strays)


def test_branch_only_files_survive(spark, tmp_path):
    lake = _mk(spark, tmp_path / "o3")
    br = lake.create_branch("audit")
    br.merge(
        spark.createDataFrame(_rows(8, commit="c3", prefix="z"), SCH),
        _empty_keys(spark), "b3",
    )
    want = br.read().count()
    lake.remove_orphan_files(min_age_seconds=0)
    assert br.read().count() == want  # branch head files untouched
    assert lake.read().count() == 40


def test_branch_intermediate_history_survives(spark, tmp_path):
    """A file referenced ONLY by a branch's intermediate snapshot (its
    head's rewrite superseded it) must survive a main-handle sweep —
    remove_orphan_files pins every ref's FULL chain, unlike expiry's
    heads-only retention."""
    lake = _mk(spark, tmp_path / "o4")
    br = lake.create_branch("audit")
    br.merge(
        spark.createDataFrame(_rows(8, commit="c3", prefix="z"), SCH),
        _empty_keys(spark), "b3",
    )
    v_mid = br.version
    mid_count = br.read(version=v_mid).count()
    # second COW merge updates the same keys: the first merge's files are
    # now referenced only by the branch's INTERMEDIATE snapshot
    br.merge(
        spark.createDataFrame(_rows(8, commit="c3", prefix="z"), SCH),
        _empty_keys(spark), "b4",
    )
    res = lake.remove_orphan_files(min_age_seconds=0)
    assert res["removed_snapshots"] == 0
    assert br.read(version=v_mid).count() == mid_count  # time travel whole
    assert br.read().count() == mid_count
    # and the reverse direction: a branch handle must pin main's history
    v_main_mid = 1
    main_mid = lake.read(version=v_main_mid).count()
    br.remove_orphan_files(min_age_seconds=0)
    assert lake.read(version=v_main_mid).count() == main_mid
