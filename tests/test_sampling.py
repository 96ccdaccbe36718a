"""corpus_split / mixture_resample / corpus_shuffle: determinism,
proportions, growth stability, copy-count law, permutation laws, and
direct DuckDB parity of the oracle SQL."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from valentine_spark.operators import corpus_shuffle, corpus_split, mixture_resample
from valentine_spark.operators.sampling import (
    corpus_shuffle_sql,
    corpus_split_sql_case,
    mixture_resample_sql,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.format_string("src%d", F.pmod("id", F.lit(5))).alias("source"),
    )


def test_split_is_a_partition_with_right_proportions(spark):
    out = corpus_split(_docs(spark), {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 2000
    assert counts["train"] > 1700  # ~1800 expected
    assert 40 < counts["val"] + counts["test"] < 260


def test_split_deterministic_across_partitionings(spark):
    a = {r["doc_id"]: r["split"] for r in corpus_split(_docs(spark)).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in corpus_split(_docs(spark).repartition(13)).collect()
    }
    assert a == b


def test_split_stable_under_corpus_growth(spark):
    """A document's split never changes when the corpus grows — the property
    hash-keying buys over rank/position-keying."""
    small = {r["doc_id"]: r["split"] for r in corpus_split(_docs(spark, 300)).collect()}
    big = {r["doc_id"]: r["split"] for r in corpus_split(_docs(spark, 2000)).collect()}
    assert all(big[k] == v for k, v in small.items())


def test_split_salt_gives_independent_assignment(spark):
    a = {r["doc_id"]: r["split"] for r in corpus_split(_docs(spark), salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in corpus_split(_docs(spark), salt="s2").collect()}
    assert a != b  # astronomically unlikely to coincide on 2000 docs


def test_split_null_id_lands_in_last_split(spark):
    df = spark.createDataFrame([(None,), (1,)], "doc_id int")
    out = {r["doc_id"]: r["split"] for r in corpus_split(df).collect()}
    assert out[None] == "test"


def test_split_bad_weights_rejected(spark):
    with pytest.raises(ValueError, match="positive"):
        corpus_split(_docs(spark, 1), {"a": 0.0})
    with pytest.raises(ValueError, match="negative"):
        corpus_split(_docs(spark, 1), {"a": 1.0, "b": -0.1})


WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.25, "src3": 0.0}


def test_mixture_copy_count_law(spark):
    """Each doc appears floor(w) or floor(w)+1 times; per-source mean ~= w;
    weight-0 and unlisted sources vanish; copy_id is 1..n."""
    out = mixture_resample(_docs(spark), WEIGHTS).cache()
    try:
        rows = (
            out.groupBy("doc_id", "source")
            .agg(F.count("*").alias("n"), F.min("copy_id").alias("lo"), F.max("copy_id").alias("hi"))
            .collect()
        )
        # every surviving doc has contiguous copy ids 1..n
        assert all(r["lo"] == 1 and r["hi"] == r["n"] for r in rows)
        per_doc = {(r["doc_id"], r["source"]): r["n"] for r in rows}
        totals = {}
        for (doc, src), n in per_doc.items():
            w = WEIGHTS[src]
            assert n in (int(w), int(w) + 1), (doc, src, n, w)
            totals.setdefault(src, []).append(n)
        assert "src3" not in totals and "src4" not in totals  # 0-weight + unlisted
        for src, ns in totals.items():
            mean = sum(ns) / (2000 / 5)  # 400 docs per source
            assert abs(mean - WEIGHTS[src]) < 0.15, (src, mean)
    finally:
        out.unpersist()


def test_mixture_deterministic(spark):
    a = sorted(map(tuple, mixture_resample(_docs(spark, 500), WEIGHTS).collect()))
    b = sorted(
        map(tuple, mixture_resample(_docs(spark, 500).repartition(11), WEIGHTS).collect())
    )
    assert a == b


def test_mixture_empty_weights_rejected(spark):
    with pytest.raises(ValueError, match="at least one"):
        mixture_resample(_docs(spark, 1), {})
    with pytest.raises(ValueError, match="negative"):
        mixture_resample(_docs(spark, 1), {"src0": -1.0})


def test_shuffle_is_a_permutation_and_deterministic(spark):
    out = corpus_shuffle(_docs(spark, 1000))
    ranks = sorted(r["shuffle_rank"] for r in out.collect())
    assert ranks == list(range(1, 1001))
    again = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(_docs(spark, 1000).repartition(17)).collect()
    }
    first = {r["doc_id"]: r["shuffle_rank"] for r in out.collect()}
    assert first == again
    # and it actually shuffles: the identity order would be astronomical
    assert any(first[i] != i + 1 for i in range(1000))


def test_shuffle_salt_gives_independent_permutation(spark):
    a = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(_docs(spark, 500), salt="e1").collect()}
    b = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(_docs(spark, 500), salt="e2").collect()}
    assert a != b


def test_shuffle_composes_with_packing(spark):
    """shuffle-then-pack: the rank is unique, so pack_sequences accepts it
    as the order key and conserves every token exactly once."""
    from valentine_spark.operators import pack_sequences

    docs = _docs(spark, 300).withColumn(
        "text", F.concat(F.lit("tok "), F.repeat(F.lit("w "), F.pmod("doc_id", F.lit(7)).cast("int")))
    )
    shuffled = corpus_shuffle(docs)
    packed = pack_sequences(shuffled, seq_len=64, id_col="shuffle_rank")
    total_in = docs.select(
        F.sum(F.size(F.filter(F.split("text", " "), lambda x: x != ""))).alias("n")
    ).collect()[0]["n"]
    total_out = packed.agg(F.sum("n_tokens").alias("n")).collect()[0]["n"]
    assert total_in == total_out
    # every pack except the last is exactly full
    sizes = {
        r["pack_id"]: r["n"]
        for r in packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("n")).collect()
    }
    last = max(sizes)
    assert all(n == 64 for p, n in sizes.items() if p != last)


def test_oracle_sql_parity(spark):
    """The generated DuckDB SQL replays BOTH operators bit-for-bit on the
    same rows — the cross-engine md5-uniform contract, checked directly."""
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(400)),
            "source": [f"src{i % 5}" for i in range(400)],
        }
    )
    df = spark.createDataFrame(pdf)

    got_split = {
        r["doc_id"]: r["split"] for r in corpus_split(df).select("doc_id", "split").collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want_split = dict(
        con.execute(
            f"SELECT doc_id, {corpus_split_sql_case()} AS split FROM documents"
        ).fetchall()
    )
    assert got_split == want_split

    got_mix = sorted(
        map(tuple, mixture_resample(df, WEIGHTS).select("doc_id", "source", "copy_id").collect())
    )
    want_mix = sorted(
        con.execute(
            mixture_resample_sql(WEIGHTS, select="doc_id, source")
        ).fetchall()
    )
    assert got_mix == [tuple(r) for r in want_mix]

    got_shuf = {
        r["doc_id"]: r["shuffle_rank"]
        for r in corpus_shuffle(df).select("doc_id", "shuffle_rank").collect()
    }
    want_shuf = dict(con.execute(corpus_shuffle_sql(select="doc_id")).fetchall())
    assert got_shuf == want_shuf
