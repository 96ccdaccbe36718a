"""Secondary-column file statistics + predicate data skipping
(``LakeTable.scan`` — the Iceberg metadata-pruned scan / Delta
data-skipping analogue).

Invariants under test:
  * EXACTNESS: scan(where) == read().filter(where) in every state — clean,
    dirty (MoR), post-compact, post-evolution, post-rebucket;
  * PRUNING: selective predicates actually shrink the file set Spark reads
    (``inputFiles``), and ``prune_preview`` reports it;
  * SOUNDNESS of the string-truncation bounds (16-char prefix lower bound /
    incremented upper bound) on long shared-prefix strings;
  * dirty buckets are never stats-pruned (the stale-version resurrection
    hazard), clean buckets are.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from valentine_spark.cdc import LakeTable, apply_batch, synth_change_stream
from valentine_spark.cdc.lake import (
    _file_may_match,
    _string_upper_bound,
)


def _mk_lake(spark, path, **kw):
    lake = LakeTable.create(str(path), spark, n_buckets=4,
                            target_file_rows=200, stats_cols=["lang"], **kw)
    stream = synth_change_stream(spark, 6000, 4000, seed=11)
    apply_batch(lake, stream.where(F.col("lsn") < 3000), "b1")
    apply_batch(lake, stream.where(F.col("lsn") >= 3000), "b2")
    return lake


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_scan_equals_filtered_read_and_prunes(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path / "t")
    want = _rows(lake.read().where(F.col("lang") == "rust").drop("_bucket"))
    # khash-clustered ingest scatters lang across every file: scan is exact
    # but bounds are wide (no pruning expected yet)
    got_df = lake.scan([("lang", "=", "rust")])
    assert _rows(got_df) == want and len(want) > 0
    # OPTIMIZE-style re-clustering makes the bounds tight...
    lake.compact(min_files=1, sort_cols=["lang"])
    got_df = lake.scan([("lang", "=", "rust")])
    assert _rows(got_df) == want
    # ...and the pruning becomes real: fewer files enter the plan
    full_files = set(lake.read().inputFiles())
    scan_files = set(got_df.inputFiles())
    assert scan_files < full_files, (len(scan_files), len(full_files))
    pv = lake.prune_preview([("lang", "=", "rust")])
    assert pv["kept_files"] == len(scan_files)
    assert pv["total_files"] == len(full_files)


def test_scan_no_match_reads_zero_files(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path / "t0")
    df = lake.scan([("lang", "=", "zzz-not-a-lang")])
    assert df.count() == 0
    assert lake.prune_preview([("lang", "=", "zzz-not-a-lang")])["kept_files"] == 0


def test_scan_conjunction_and_non_stats_residual(spark, tmp_path):
    """Predicates on non-stats columns never prune but still filter."""
    lake = _mk_lake(spark, tmp_path / "t1")
    want = _rows(
        lake.read()
        .where((F.col("lang") == "go") & (F.col("path") > "src/m"))
        .drop("_bucket")
    )
    got = lake.scan([("lang", "=", "go"), ("path", ">", "src/m")])
    assert _rows(got) == want


def test_scan_unknown_column_or_op_raises(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path / "t2")
    with pytest.raises(KeyError):
        lake.scan([("nope", "=", 1)])
    with pytest.raises(ValueError):
        lake.scan([("lang", "!=", "go")])


def test_numeric_range_scan(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("stars", T.LongType()),
        ]
    )
    lake = LakeTable.create(
        str(tmp_path / "num"), spark, schema=schema, n_buckets=2,
        target_file_rows=200, stats_cols=["stars"],
    )
    rows = spark.range(4000).select(
        F.concat(F.lit("org/r"), F.pmod("id", F.lit(5))).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("head").alias("commit"),
        F.col("id").alias("stars"),
    )
    lake.merge(rows, rows.limit(0).select("repo", "path", "commit"), "b1")
    lake.compact(min_files=1, sort_cols=["stars"])
    for where, pyfilter in [
        ([("stars", ">=", 3900)], F.col("stars") >= 3900),
        ([("stars", "<", 50)], F.col("stars") < 50),
        ([("stars", ">", 1000), ("stars", "<=", 1100)],
         (F.col("stars") > 1000) & (F.col("stars") <= 1100)),
    ]:
        want = _rows(lake.read().where(pyfilter).drop("_bucket"))
        got_df = lake.scan(where)
        assert _rows(got_df) == want and len(want) > 0
        assert len(set(got_df.inputFiles())) < len(set(lake.read().inputFiles()))


def test_string_truncation_bounds_are_sound(spark, tmp_path):
    """Strings longer than 16 chars sharing a prefix: bounds must keep the
    file for any value inside the true range and may only over-keep."""
    assert _string_upper_bound("a" * 16) == "a" * 16              # exact
    ub = _string_upper_bound("abcdefgh12345678ZZZZ")
    assert ub is not None and ub > "abcdefgh12345678ZZZZ"
    assert _file_may_match(
        {"lang": ["prefixprefixpref", _string_upper_bound("prefixprefixprefixB")]},
        [("lang", "=", "prefixprefixprefixA")],
    )
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("tag", T.StringType()),
        ]
    )
    lake = LakeTable.create(
        str(tmp_path / "str"), spark, schema=schema, n_buckets=2,
        target_file_rows=300, stats_cols=["tag"],
    )
    rows = spark.range(2000).select(
        F.concat(F.lit("org/r"), F.pmod("id", F.lit(3))).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("head").alias("commit"),
        # 20+ char tags with a long shared prefix — the truncation stressor
        F.concat(F.lit("release/2026/team-"), F.pmod("id", F.lit(7))).alias("tag"),
    )
    lake.merge(rows, rows.limit(0).select("repo", "path", "commit"), "b1")
    want = _rows(lake.read().where(F.col("tag") == "release/2026/team-3").drop("_bucket"))
    got = lake.scan([("tag", "=", "release/2026/team-3")])
    assert _rows(got) == want and len(want) > 0


def test_dirty_mor_buckets_resolve_before_filtering(spark, tmp_path):
    """The resurrection hazard: key K has an old version with lang=rust and
    a NEW version with lang=go.  scan(lang=rust) on the dirty table must
    return nothing for K — pruning files by stats before MoR resolution
    would wrongly resurrect the old rust row."""
    lake = LakeTable.create(str(tmp_path / "mor"), spark, n_buckets=2,
                            target_file_rows=500, stats_cols=["lang"],
                            write_mode="mor")
    stream = synth_change_stream(spark, 3000, 400, seed=7)
    apply_batch(lake, stream.where(F.col("lsn") < 1500), "b1")
    # rewrite EVERY surviving key to lang=flipped (keeps buckets dirty)
    flip = lake.read().drop("_bucket").withColumn("lang", F.lit("flipped")) \
        .withColumn("lsn", F.lit(10_000_000).cast("long")) \
        .withColumn("op_ts", F.current_timestamp()) \
        .withColumn("op", F.lit("upsert")) \
        .select("lsn", "op_ts", "op", "repo", "path", "commit", "lang", "content")
    apply_batch(lake, flip, "b2")
    assert lake.metadata().get("dirty"), "test requires dirty buckets"
    # every current row is lang=flipped; old langs must not resurrect
    for old_lang in ["rust", "go", "python"]:
        assert lake.scan([("lang", "=", old_lang)]).count() == 0
    n = lake.scan([("lang", "=", "flipped")]).count()
    assert n == lake.read().count() and n > 0
    # compact() returns the table to the prunable path with equal results
    lake.compact()
    assert not lake.metadata().get("dirty")
    assert lake.scan([("lang", "=", "rust")]).count() == 0
    assert lake.scan([("lang", "=", "flipped")]).count() == n
    pv = lake.prune_preview([("lang", "=", "not-there")])
    assert pv["kept_files"] == 0 and pv["total_files"] > 0


def test_stats_survive_compaction_and_evolution(spark, tmp_path):
    lake = _mk_lake(spark, tmp_path / "t3")
    want = _rows(lake.read().where(F.col("lang") == "scala").drop("_bucket"))
    lake.compact(min_files=1, sort_cols=["lang"])
    got_df = lake.scan([("lang", "=", "scala")])
    assert _rows(got_df) == want
    assert len(set(got_df.inputFiles())) < len(set(lake.read().inputFiles()))
    # evolution: new column has no bounds in old files -> unprunable but exact
    lake.evolve_schema([T.StructField("stars", T.LongType())], "add stars")
    got2 = lake.scan([("lang", "=", "scala")])
    assert sorted(r["path"] for r in got2.collect()) == sorted(t[1] for t in want)


def test_create_rejects_unknown_stats_col(spark, tmp_path):
    with pytest.raises(KeyError):
        LakeTable.create(str(tmp_path / "bad"), spark, stats_cols=["nope"])
