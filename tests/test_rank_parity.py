"""Global-rank parity vs the reference's actual mechanism: the reference
pipes the distinct corpus through GNU ``sort -n`` with LC_ALL=C and assigns
rank = line number (clustering_utils.py:259-305).  Here we run THAT exact
subprocess on a mixed numeric/string corpus and assert our distributed
rank job reproduces the ranking of every value."""

import os
import subprocess

import pytest
from pyspark.sql import functions as F

from valentine_spark.matchers.distribution_based.matcher import DistributionBased
from valentine_spark.sources.profiles import profile_table
from valentine_spark.types import convert_data_type

CORPUS = [
    "1113", "874", "9", "0.5", "-3", "2.50", "1e2",
    "apple", "Banana", "zebra", " space", "Zebra",
    "2-s2.0-84924565530", "10.1126/science.aaa1934",
    "2015", "0", "-0.25", "année", "ärger",
]


def unix_sort_ranks(values):
    """The reference's exact subprocess (requires GNU sort; skip otherwise)."""
    inp = "\n".join(str(v) for v in values) + "\n"
    env = dict(os.environ, LC_ALL="C")
    out = subprocess.run(
        ["sort", "-n"], input=inp.encode(), capture_output=True, env=env, check=True
    )
    ranks = {}
    for i, line in enumerate(out.stdout.decode().splitlines(), start=1):
        ranks[convert_data_type(line)] = i  # later (higher) rank wins, like the dict
    return ranks


def test_global_ranks_match_unix_sort(spark):
    df = spark.createDataFrame([(v,) for v in CORPUS], "val string")
    profile = profile_table(df, "t")
    # rank each distinct corpus value with the engine's exact sort key
    corpus = profile.select("value").distinct()
    extracted = F.regexp_extract("value", r"^[ \t]*([+-]?(\d+(\.\d*)?|\.\d+))", 1)
    keyed = corpus.withColumn(
        "sort_num", F.when(extracted == "", F.lit(0.0)).otherwise(extracted.cast("double"))
    )
    from pyspark.sql.window import Window

    ours = {
        r["value"]: r["rank"]
        for r in keyed.withColumn(
            "rank", F.row_number().over(Window.orderBy("sort_num", "value"))
        ).collect()
    }

    expected = unix_sort_ranks(CORPUS)
    for v in CORPUS:
        key = convert_data_type(v)
        # reference dict collapses convert_data_type collisions later-wins;
        # compare the rank ORDER of surviving keys
        assert key in expected
    # order parity: sort both rankings and compare sequences of raw values
    ours_order = [v for v, _ in sorted(ours.items(), key=lambda kv: kv[1])]
    ref_sorted = subprocess.run(
        ["sort", "-n"],
        input=("\n".join(CORPUS) + "\n").encode(),
        capture_output=True,
        env=dict(os.environ, LC_ALL="C"),
        check=True,
    ).stdout.decode().splitlines()
    assert ours_order == ref_sorted, (ours_order, ref_sorted)


def test_distributed_row_number_matches_global_window(spark):
    """Two-phase rank == bare global-window rank, at any partitioning."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from valentine_spark.utils.ranking import distributed_row_number

    vals = [(float(x),) for x in [5, 1, 9, 3, 7, 2, 8, 0, 6, 4, 10, -3, 2.5]]
    df = spark.createDataFrame(vals, "v double").repartition(7)
    got = {
        r["v"]: r["rank"]
        for r in distributed_row_number(df, ["v"], num_partitions=5).collect()
    }
    want = {
        r["v"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(Window.orderBy("v"))).collect()
    }
    assert got == want


def test_distributed_row_number_empty(spark):
    from valentine_spark.utils.ranking import distributed_row_number

    df = spark.createDataFrame([], "v double")
    assert distributed_row_number(df, ["v"]).count() == 0


def test_distributed_row_number_stable_under_projection(spark):
    """Regression (round 4): the rank must be a pure function of the input —
    identical across re-evaluations — even when a projection above it drops
    the sort columns and keeps only derived columns.  The round-3
    implementation depended on exchange reuse unifying its two branches;
    column pruning could specialize the branches' shuffles differently,
    yielding duplicate ranks that differed per evaluation (this exact shape,
    via __spark_entry__._wal_stream, flipped insert/update ops in the
    changelog oracles)."""
    from valentine_spark.utils.ranking import distributed_row_number

    df = spark.range(20_000).select(
        F.xxhash64("id").alias("k"),
        F.col("id").alias("uid"),
        F.pmod("id", F.lit(7)).alias("payload"),
    )
    ranked = distributed_row_number(df, ["k", "uid"], rank_col="rn")
    # projection keeps ONLY derived columns — prunes k and uid above the rank
    proj = ranked.select("rn", (F.col("payload") * 2).alias("p2"))
    runs = [frozenset(map(tuple, proj.collect())) for _ in range(3)]
    assert len({len(r) for r in runs}) == 1 and len(runs[0]) == 20_000
    assert runs[0] == runs[1] == runs[2]
    ranks = sorted(x[0] for x in runs[0])
    assert ranks == list(range(1, 20_001))  # a permutation: no dups, no gaps
