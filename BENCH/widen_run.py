"""Measure type widening (LakeTable.widen_column): the op must be O(1)
metadata-only regardless of table size, and the era-cast read of a mixed
int32/int64 table must cost the same as reading a pure-int64 control.

Arms, per table size (two sizes to show the O(1) law):

  widen_sec        wall of widen_column on the loaded table — expect
                   milliseconds, flat across sizes, zero files rewritten
  read_mixed_sec   full-table agg (count + sum) over the MIXED-era table
                   (first half written int32, second half int64)
  read_pure_sec    the same agg over a control table holding identical
                   data written int64 from the start — the era-cast
                   overhead is read_mixed/read_pure
  rewrite_alt_sec  compact(min_files=1) on the mixed table: the full-
                   table rewrite a widen-less format forces instead,
                   with its bytes_rewritten — the cost widening avoids

Sums are asserted equal between mixed and control.

Run:  python BENCH/widen_run.py [--events 4000000] [--keys 1000000]
Writes BENCH/widen.json (one JSON doc, load-stamped).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F, types as T

from valentine_spark.cdc import LakeTable, replay, synth_change_stream


def _agg(lake):
    t = time.time()
    row = lake.read().agg(
        F.count("*").alias("n"), F.sum("size_bytes").alias("s")
    ).collect()[0]
    return round(time.time() - t, 3), int(row["n"]), int(row["s"])


def run_size(spark, n_events, n_keys, root):
    size_int = F.length(F.coalesce("content", F.lit(""))).cast("int")
    size_long = F.length(F.coalesce("content", F.lit(""))).cast("long") + F.lit(2**40)
    stream = synth_change_stream(spark, n_events, n_keys, seed=11)
    half = n_events // 2

    lake = LakeTable.create(
        os.path.join(root, f"mixed_{n_events}"), spark, n_buckets=16,
        target_file_rows=max(n_keys // 64, 2_000),
    )
    t0 = time.time()
    replay(
        lake, stream.where(F.col("lsn") <= half).withColumn("size_bytes", size_int),
        batch_lsns=max(half // 2, 1), max_lsn=half,
    )
    load_sec = time.time() - t0
    assert lake.schema["size_bytes"].dataType == T.IntegerType()
    files_before = {
        e["path"] for es in lake._bucket_files(lake.metadata()).values() for e in es
    }

    t0 = time.time()
    lake.widen_column("size_bytes", T.LongType())
    widen_sec = round(time.time() - t0, 4)
    files_after = {
        e["path"] for es in lake._bucket_files(lake.metadata()).values() for e in es
    }
    assert files_after == files_before, "widen must rewrite zero files"

    replay(
        lake, stream.where(F.col("lsn") > half).withColumn("size_bytes", size_long),
        batch_lsns=max(half // 2, 1), batch_id_prefix="tail",
    )
    read_mixed_sec, n_mixed, s_mixed = _agg(lake)

    control = LakeTable.create(
        os.path.join(root, f"pure_{n_events}"), spark, n_buckets=16,
        target_file_rows=max(n_keys // 64, 2_000),
    )
    replay(
        control,
        stream.withColumn(
            "size_bytes",
            F.when(F.col("lsn") <= half, size_int.cast("long")).otherwise(size_long),
        ),
        batch_lsns=max(half // 2, 1),
    )
    read_pure_sec, n_pure, s_pure = _agg(control)
    assert (n_mixed, s_mixed) == (n_pure, s_pure), (n_mixed, s_mixed, n_pure, s_pure)

    t0 = time.time()
    lake.compact(min_files=1)
    rewrite_alt_sec = round(time.time() - t0, 1)
    rewrite_alt_bytes = sum(
        e["bytes"] for es in lake._bucket_files(lake.metadata()).values() for e in es
    )

    return {
        "n_events": n_events,
        "load_sec": round(load_sec, 1),
        "widen_sec": widen_sec,
        "read_mixed_sec": read_mixed_sec,
        "read_pure_sec": read_pure_sec,
        "era_cast_overhead": round(read_mixed_sec / max(read_pure_sec, 1e-9), 3),
        "rewrite_alt_sec": rewrite_alt_sec,
        "rewrite_alt_bytes": rewrite_alt_bytes,
        "rows": n_mixed,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "widen.json"))
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="widen_bench_")
    doc = {
        "cpus": args.cpus,
        "load_pre": os.getloadavg()[0],
        "sizes": [
            run_size(spark, args.events // 4, args.keys // 4, root),
            run_size(spark, args.events, args.keys, root),
        ],
        "load_post": None,
    }
    doc["load_post"] = os.getloadavg()[0]
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
