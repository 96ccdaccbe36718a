"""pack_sequences + distributed_prefix_sum: window parity, slice
invariants, exact handcrafted layouts, edge cases."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from valentine_spark.operators import pack_sequences
from valentine_spark.utils.ranking import distributed_prefix_sum


def test_prefix_sum_matches_global_window(spark):
    """Two-phase prefix sum == bare global-window running sum, at any
    partitioning, inclusive and exclusive."""
    rows = [(i, (i * 37) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v int").repartition(7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {r["k"]: r["s"] for r in df.withColumn("s", F.sum("v").over(w)).collect()}

    got = {
        r["k"]: r["s"]
        for r in distributed_prefix_sum(df, ["k"], "v", out_col="s", num_partitions=5).collect()
    }
    assert got == want

    got_ex = {
        r["k"]: r["s"]
        for r in distributed_prefix_sum(
            df, ["k"], "v", out_col="s", num_partitions=5, exclusive=True
        ).collect()
    }
    assert got_ex == {k: want[k] - dict(rows)[k] for k in want}


def test_prefix_sum_null_values_count_zero(spark):
    df = spark.createDataFrame([(1, 5), (2, None), (3, 7)], "k int, v int")
    got = {
        r["k"]: r["s"]
        for r in distributed_prefix_sum(df, ["k"], "v", out_col="s").collect()
    }
    assert got == {1: 5, 2: 5, 3: 12}


def test_prefix_sum_empty(spark):
    df = spark.createDataFrame([], "k int, v int")
    assert distributed_prefix_sum(df, ["k"], "v").count() == 0


def test_pack_exact_layout(spark):
    """Handcrafted stream: a=3, b=5, c=4 tokens, seq_len=4 ->
    pack0 = a[0:3) + b[0:1), pack1 = b[1:5), pack2 = c[0:4)."""
    df = spark.createDataFrame(
        [
            ("a", "t t t"),
            ("b", "t t t t t"),
            ("c", "t t t t"),
            ("d", ""),       # zero tokens: emits nothing
            ("e", "   "),    # whitespace-only: zero tokens, emits nothing
            ("f", None),     # NULL text: zero tokens, emits nothing
        ],
        "doc_id string, text string",
    )
    out = pack_sequences(df, seq_len=4)
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [
        (0, "a", 0, 0, 3),
        (0, "b", 0, 3, 1),
        (1, "b", 1, 0, 4),
        (2, "c", 0, 0, 4),
    ]


def test_pack_long_doc_spans_many_packs(spark):
    """A 10-token doc at seq_len=3 spans packs 0..3 with contiguous slices."""
    df = spark.createDataFrame([("x", " ".join(["w"] * 10))], "doc_id string, text string")
    rows = sorted(tuple(r) for r in pack_sequences(df, seq_len=3).collect())
    assert rows == [
        (0, "x", 0, 0, 3),
        (1, "x", 3, 0, 3),
        (2, "x", 6, 0, 3),
        (3, "x", 9, 0, 1),
    ]


def test_pack_invariants_random_corpus(spark):
    """Structural invariants on a generated corpus: every non-final pack is
    exactly full; per-doc slices reassemble the document; slices within a
    pack tile it with no gaps or overlaps."""
    seq_len = 32
    docs = spark.range(200).select(
        F.format_string("doc%04d", F.col("id")).alias("doc_id"),
        # 0..40 tokens, some empty; guard the 0 case explicitly because
        # Spark's sequence(1, 0) steps DOWN to [1, 0] instead of emitting
        # an empty array
        F.when(F.pmod("id", F.lit(41)) == 0, F.lit("")).otherwise(
            F.expr("array_join(transform(sequence(1, cast(id % 41 as int)), i -> 'w'), ' ')")
        ).alias("text"),
    )
    out = pack_sequences(docs, seq_len=seq_len).cache()
    try:
        total_tokens = sum(min(i % 41, 40) for i in range(200))

        # per-pack fullness: all packs except the last carry exactly seq_len
        per_pack = {
            r["pack_id"]: (r["tok"], r["min_off"], r["max_end"])
            for r in out.groupBy("pack_id")
            .agg(
                F.sum("n_tokens").alias("tok"),
                F.min("pack_offset").alias("min_off"),
                F.max(F.col("pack_offset") + F.col("n_tokens")).alias("max_end"),
            )
            .collect()
        }
        n_packs = max(per_pack) + 1
        assert n_packs == -(-total_tokens // seq_len)
        for pid, (tok, lo, hi) in per_pack.items():
            assert lo == 0
            if pid < n_packs - 1:
                assert tok == seq_len and hi == seq_len
            else:
                assert tok == total_tokens - (n_packs - 1) * seq_len and hi == tok

        # per-doc reassembly: slices cover [0, n_doc_tokens) contiguously
        per_doc = {
            r["doc_id"]: (r["tok"], r["min_off"], r["max_end"], r["n_slices"])
            for r in out.groupBy("doc_id")
            .agg(
                F.sum("n_tokens").alias("tok"),
                F.min("doc_offset").alias("min_off"),
                F.max(F.col("doc_offset") + F.col("n_tokens")).alias("max_end"),
                F.count(F.lit(1)).alias("n_slices"),
            )
            .collect()
        }
        for i in range(200):
            n = min(i % 41, 40)
            key = f"doc{i:04d}"
            if n == 0:
                assert key not in per_doc
            else:
                tok, lo, hi, n_slices = per_doc[key]
                assert (tok, lo, hi) == (n, 0, n)
                # a doc's slices are consecutive pack_ids
                assert n_slices >= 1

        # tiling: within each pack, sorted slices are gap-free
        slices = {}
        for r in out.collect():
            slices.setdefault(r["pack_id"], []).append(
                (r["pack_offset"], r["pack_offset"] + r["n_tokens"])
            )
        for pid, ss in slices.items():
            ss.sort()
            for (a0, a1), (b0, b1) in zip(ss, ss[1:]):
                assert a1 == b0
    finally:
        out.unpersist()


def test_pack_bad_seq_len_rejected(spark):
    df = spark.createDataFrame([("a", "x")], "doc_id string, text string")
    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, seq_len=0)
