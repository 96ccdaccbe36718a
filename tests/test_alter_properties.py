"""alter_properties: post-create changes to write properties (the ALTER
TABLE SET TBLPROPERTIES analogue) — stats_cols / bloom_cols /
target_file_rows / write_mode, one metadata commit, future writes only.

Invariants:
  * newly added stats columns prune files written AFTER the alter; files
    predating it have no bounds and are always kept (sound), and a sorted
    compact makes pruning retroactive;
  * write_mode flips the DEFAULT merge mode for later batches;
  * target_file_rows governs later writes' file sizing;
  * unknown columns and bad values reject before any commit; a no-change
    call commits nothing.
"""

import pytest
from pyspark.sql import functions as F
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
LANGS = ["py", "go", "rs", "js"]


def _empty_keys(spark):
    return spark.createDataFrame([], T.StructType(SCH.fields[:3]))


def _rows(n, commit="c1", prefix="p"):
    return [
        (f"r{i % 3}", f"{prefix}{i}", commit, LANGS[i % 4], f"x{i}")
        for i in range(n)
    ]


def test_added_stats_col_prunes_future_writes(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "a1"), spark, schema=SCH, n_buckets=2, target_file_rows=30
    )
    lake.merge(spark.createDataFrame(_rows(60), SCH), _empty_keys(spark), "b1")
    assert lake.metadata()["stats_cols"] == []
    lake.alter_properties(stats_cols=["lang"])
    assert lake.metadata()["stats_cols"] == ["lang"]
    lake.merge(
        spark.createDataFrame(_rows(60, commit="c2", prefix="q"), SCH),
        _empty_keys(spark), "b2",
    )
    # correctness first: scan equals a plain filtered read everywhere
    want = lake.read().where(F.col("lang") == "py").count()
    assert lake.scan([("lang", "=", "py")]).count() == want
    # pre-alter files have no bounds -> always kept (sound); a sorted
    # compaction rewrites everything under the new list and prunes tight
    lake.compact(min_files=1, sort_cols=["lang"])
    pv = lake.prune_preview([("lang", "=", "py")])
    assert pv["kept_files"] < pv["total_files"]
    assert lake.scan([("lang", "=", "py")]).count() == want


def test_write_mode_flip_changes_default(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "a2"), spark, schema=SCH, n_buckets=2, target_file_rows=50
    )
    lake.merge(spark.createDataFrame(_rows(30), SCH), _empty_keys(spark), "b1")
    lake.alter_properties(write_mode="mor")
    # an update batch under the new default leaves the bucket dirty (MoR)
    lake.merge(
        spark.createDataFrame(_rows(10), SCH), _empty_keys(spark), "b2"
    )
    assert lake.metadata()["dirty"], "MoR default should defer resolution"
    assert lake.read().count() == 30  # resolution still correct


def test_target_file_rows_governs_later_writes(spark, tmp_path):
    lake = LakeTable.create(
        str(tmp_path / "a3"), spark, schema=SCH, n_buckets=1, target_file_rows=1000
    )
    lake.merge(spark.createDataFrame(_rows(100), SCH), _empty_keys(spark), "b1")
    files_before = sum(
        len(es) for es in lake._bucket_files(lake.metadata()).values()
    )
    lake.alter_properties(target_file_rows=10)
    lake.merge(
        spark.createDataFrame(_rows(100, commit="c2", prefix="q"), SCH),
        _empty_keys(spark), "b2",
    )
    files_after = sum(
        len(es) for es in lake._bucket_files(lake.metadata()).values()
    )
    assert files_after - files_before >= 9  # ~100 new rows / 10 per file


def test_validation_and_noop(spark, tmp_path):
    lake = LakeTable.create(str(tmp_path / "a4"), spark, schema=SCH, n_buckets=2)
    with pytest.raises(KeyError, match="not in table schema"):
        lake.alter_properties(stats_cols=["nope"])
    with pytest.raises(ValueError, match="write_mode"):
        lake.alter_properties(write_mode="magic")
    with pytest.raises(ValueError, match="positive"):
        lake.alter_properties(target_file_rows=0)
    v = lake.version
    lake.alter_properties()  # nothing to change: no commit
    lake.alter_properties(write_mode="cow")  # equal to current: no commit
    assert lake.version == v
    res = lake.alter_properties(stats_cols=["lang"], note="enable pruning")
    assert lake.version == v + 1 and res["alter_properties"] == {
        "stats_cols": ["lang"]
    }
