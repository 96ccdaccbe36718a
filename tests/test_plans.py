"""Plan audits: the optimizer properties we rely on at 100 TB, asserted on
the actual physical plans (SURVEY.md §4 'what Catalyst gives us')."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from valentine_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    scan_columns,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = E.q3_segment_revenue(spark, sf_dir)
    pushed = pushed_filters(df)
    assert any("c_mktsegment" in f for f in pushed), pushed


def test_column_pruning(spark, sf_dir):
    df = E.q1_pricing_summary(spark, sf_dir)
    scans = scan_columns(df)
    assert scans, "no scans found"
    # lineitem has 11 columns; q1 needs only 5
    assert all(len(cols) <= 6 for cols in scans), scans


def test_small_dims_broadcast(spark, sf_dir):
    df = E.q5_nation_revenue(spark, sf_dir)
    assert has_broadcast_join(df)


def test_profile_unpivot_single_scan(spark, sf_dir):
    """The column profiler must read the table ONCE (Expand over one scan),
    not once per column."""
    from valentine_spark.sources.profiles import profile_table

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    prof = profile_table(cust, "customer")
    import re

    text = explain_str(prof)
    scan_nodes = re.findall(r"\(\d+\) Scan parquet", text)
    assert len(scan_nodes) == 1, text
    assert "Expand" in text


def test_lww_agg_is_partial(spark):
    """The LWW max_by aggregation must show a partial (map-side) phase —
    the structural skew defense."""
    from valentine_spark.cdc import lww_dedup, synth_change_stream

    import re

    stream = synth_change_stream(spark, 1000, 100)
    plan = explain_str(lww_dedup(stream))
    # two aggregate nodes = partial (map-side) + final; max_by with a struct
    # ordering compiles to SortAggregate, still with a partial phase
    agg_nodes = re.findall(r"\(\d+\) (?:Sort|Hash|ObjectHash)Aggregate", plan)
    assert len(agg_nodes) >= 2, plan
    assert "partial" in plan.lower()
    # and exactly one exchange: single shuffle, no window-style global sort
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_lsn_slice_pushdown(spark, tmp_path):
    """Replay's LSN-range filters must push to a parquet-backed stream scan."""
    from valentine_spark.cdc import synth_change_stream

    p = str(tmp_path / "stream_pq")
    synth_change_stream(spark, 2000, 300).write.parquet(p)
    stream = spark.read.parquet(p)
    sliced = stream.where((F.col("lsn") >= 500) & (F.col("lsn") < 1000))
    pushed = pushed_filters(sliced)
    assert any("lsn" in f and "GreaterThanOrEqual" in f for f in pushed), pushed


def test_asof_join_single_shuffle(spark, sf_dir):
    """The as-of join must be ONE key exchange + window — no join node, no
    range/cross explosion (the property that keeps it linear at 100 TB)."""
    import re

    df = E.events_asof_attribution(spark, sf_dir)
    text = explain_str(df)
    assert "Window" in text
    # exactly one exchange carries user_id (the asof key); the only other
    # exchanges allowed are for the tiny clicks-dedup aggregation upstream
    assert not re.search(r"CartesianProduct|BroadcastNestedLoop", text), text
    key_exchanges = re.findall(r"Exchange hashpartitioning\(user_id", text)
    assert len(key_exchanges) <= 2, text  # dedup agg + asof window


def test_distributed_rank_plan_stays_parallel(spark):
    """The literal-split-points rank (utils/ranking.py, round-4 rewrite) no
    longer depends on exchange reuse for correctness — bucket ids are pure
    row-local expressions, so both branches agree by construction (stability
    is asserted in test_rank_parity).  The load-bearing PLAN properties now:
    the full-data window is partitioned by bucket id (parallel), and the
    only SinglePartition exchange feeds the tiny per-bucket-counts
    aggregate, never the full data."""
    from valentine_spark.utils.ranking import distributed_row_number

    df = spark.range(10_000).select((F.col("id") * 7 % 1000).alias("v"), "id")
    ranked = distributed_row_number(df, ["v", "id"], num_partitions=4)
    n = ranked.count()
    assert n == 10_000
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # full-data exchange + window keyed on the bucket id
    assert "hashpartitioning(_rank_pid" in plan, plan
    # exactly two source scans: the ranked branch and ONE counts branch
    # (the offsets prefix sum is a single-row map fold, not a counts
    # self-join — a self-join re-scans the source when exchange reuse
    # does not fire, measured +50% on the cdc fixture path)
    assert plan.count("Range (0, 10000") <= 2, plan
    # the only SinglePartition exchange feeds the one-row offsets fold
    # (#buckets rows), directly above an aggregate — never full data
    lines = plan.splitlines()
    singles = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    for i in singles:
        assert "HashAggregate" in lines[i + 1] or "SortAggregate" in lines[i + 1], (
            "\n".join(lines[i : i + 3])
        )


def test_distributed_prefix_sum_plan_stays_parallel(spark):
    """Same plan contract as the rank (it shares _bucketed /
    _bucket_offset_map): the running-sum window is partitioned by the
    row-local bucket id, the source is scanned at most twice, and the only
    SinglePartition exchange feeds the one-row offsets fold — so
    pack_sequences' prefix sum never funnels the corpus through one task."""
    from valentine_spark.utils.ranking import distributed_prefix_sum

    df = spark.range(10_000).select(
        (F.col("id") * 7 % 1000).alias("v"), (F.col("id") % 9).alias("n"), "id"
    )
    summed = distributed_prefix_sum(df, ["v", "id"], "n", num_partitions=4)
    assert summed.count() == 10_000
    plan = summed._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_rank_pid" in plan, plan
    assert plan.count("Range (0, 10000") <= 2, plan
    lines = plan.splitlines()
    singles = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert singles, plan  # the offsets fold exists
    for i in singles:
        assert "HashAggregate" in lines[i + 1] or "SortAggregate" in lines[i + 1], (
            "\n".join(lines[i : i + 3])
        )


def test_cobucketed_join_no_shuffle(spark, tmp_path, sf_dir):
    """Bucketing as the co-located-join lever: two tables written bucketed
    on the join key join WITHOUT any shuffle Exchange, while the same join
    on plain parquet shuffles both sides.  (Broadcast disabled so the
    plan proves co-location, not small-table luck.)"""
    from pyspark.sql import functions as F

    from valentine_spark.sources import (
        assert_no_shuffle_join,
        cobucketed_join,
        plan_has_exchange,
        write_bucketed,
    )

    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{tmp_path}/wh'")
    write_bucketed(orders, "buckdb.orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(li, "buckdb.lineitem_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, "buckdb.orders_b", "buckdb.lineitem_b", ["o_orderkey"])
        assert_no_shuffle_join(j)  # co-located: no Exchange anywhere
        assert j.count() == orders.join(li, "o_orderkey").count()
        # control: the identical join over unbucketed parquet DOES shuffle
        assert plan_has_exchange(orders.join(li, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_chunking_and_text_gates_zero_shuffle(spark):
    """The docstring claims for chunk_documents ('pure whole-stage-codegen
    map with ZERO shuffles and no UDFs') and the single-pass text gate
    family (quality/repetition), asserted on the physical plans: no
    Exchange of any kind, no BatchEvalPython/ArrowEvalPython, and the map
    stays inside WholeStageCodegen."""
    from valentine_spark.operators.text import chunk_documents, repetition_stats
    from valentine_spark.plans import explain_str

    docs = spark.range(500).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma "), F.repeat(F.lit("x y z w "), 200)).alias(
            "text"
        ),
    )
    for name, df in (
        ("chunk", chunk_documents(docs, chunk_chars=64, overlap_chars=16)),
        ("repetition", repetition_stats(docs)),
    ):
        plan = explain_str(df)
        assert "Exchange" not in plan, (name, plan)
        assert "EvalPython" not in plan, (name, plan)  # no Python UDFs
        # formatted mode marks codegen stages with '[codegen id : N]'
        assert "codegen id" in plan or "WholeStageCodegen" in plan, (name, plan)
    # sanity: the chunker actually emits overlapping windows
    row = chunk_documents(docs, chunk_chars=64, overlap_chars=16).where(
        "doc_id = '0' and chunk_id = 1"
    ).collect()[0]
    assert len(row.chunk_text) == 64
