"""Z-order clustering (cdc/clustering.py + compact(zorder=True)): Morton
interleave keeps per-file bounds tight for EVERY clustered column, where
a lexicographic sort only tightens the leading one.

Fixture: a 64x64 (x, y) grid in one bucket, 16 files.  After
compact(sort_cols=[x, y]) lexicographic, a y-only predicate prunes
nothing (y cycles inside every file); after zorder, both x-only and
y-only predicates prune most files.  State is unchanged either way.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)


def _mk(spark, path):
    lake = LakeTable.create(
        str(path), spark, schema=SCHEMA, n_buckets=1, target_file_rows=256,
        stats_cols=["x", "y"],
    )
    rows = spark.range(4096).select(
        F.lit("r").alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("head").alias("commit"),
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string"
    )
    lake.merge(rows, empty, "load")
    return lake


def _kept(lake, preds):
    pv = lake.prune_preview(preds)
    return pv["kept_files"], pv["total_files"]


def test_zorder_prunes_every_dimension(spark, tmp_path):
    lake = _mk(spark, tmp_path / "z")
    before = sorted(map(tuple, lake.read().drop("_bucket").collect()))

    lake.compact(min_files=1, sort_cols=["x", "y"])  # lexicographic
    kx, total = _kept(lake, [("x", "=", 7)])
    ky, _ = _kept(lake, [("y", "=", 7)])
    assert kx < total  # leading column prunes
    assert ky == total  # trailing column cannot: y cycles inside every file

    lake.compact(min_files=1, sort_cols=["x", "y"], zorder=True)
    zx, total_z = _kept(lake, [("x", "=", 7)])
    zy, _ = _kept(lake, [("y", "=", 7)])
    assert zx < total_z and zy < total_z  # BOTH dimensions prune
    assert zy < ky  # strictly better than lexicographic on the trailing col
    # a 2-D point predicate prunes to a handful of files
    zxy, _ = _kept(lake, [("x", "=", 7), ("y", "=", 7)])
    assert zxy <= max(total_z // 4, 1)
    # clustering is metadata+layout only: state unchanged, scan exact
    assert sorted(map(tuple, lake.read().drop("_bucket").collect())) == before
    got = {tuple(r[:3]) for r in lake.scan([("y", "=", 7)]).collect()}
    want = {("r", f"p{64 * 7 + i}", "head") for i in range(64)}
    assert got == want


def test_zorder_strings_and_validation(spark, tmp_path):
    lake = _mk(spark, tmp_path / "v")
    # string dimension: first-two-codepoint key; also exercises mixed types
    lake.compact(min_files=1, sort_cols=["path", "x"], zorder=True)
    assert lake.read().count() == 4096
    with pytest.raises(ValueError):
        lake.compact(min_files=1, sort_cols=["x"], zorder=True)  # needs 2-4
    with pytest.raises(KeyError):
        lake.compact(min_files=1, sort_cols=["x", "nope"], zorder=True)
