"""Measure the batch `lake` Python Data Source read path against the native
``LakeTable.read`` JVM parquet scan on the same replayed state — the honest
cost of the Python-worker + Arrow hop the data source adds, and the basis
for the guidance in ``sources/lake_batch.py``: use ``format("lake")`` for
composability (SQL views, catalog-less joins, tooling that only speaks
``spark.read``); use ``LakeTable.read`` for bulk analytics scans.

Also measures the one case where the data source WINS: a selective
predicate on a clustered stats column, where manifest pruning at plan time
beats the native path's read-everything-then-filter (LakeTable users get
the same pruning via ``scan(where=...)`` — this measures parity, not a
capability gap).

Usage: python BENCH/lake_ds_read_run.py [n_events] [n_keys]
Writes BENCH/lake_ds_read.json.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def timeit(fn, k=3):
    best = 1e9
    for _ in range(k):
        t = time.time()
        fn()
        best = min(best, time.time() - t)
    return round(best, 3)


def main():
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from valentine_spark.cdc import LakeTable, replay, synth_change_stream
    from valentine_spark.sources.lake_batch import register_lake

    load_pre = os.getloadavg()[0]
    stream = synth_change_stream(spark, n_events, n_keys, seed=42).cache()
    root = tempfile.mkdtemp(prefix="ds_perf_")
    lake = LakeTable.create(
        os.path.join(root, "t"), spark, n_buckets=8, stats_cols=["lang"]
    )
    replay(lake, stream, batch_lsns=max(n_events // 4, 1))
    lake.compact(sort_cols=["lang"])  # clustered bounds for the pruning arm
    rows = lake.read().count()
    register_lake(spark)
    ds = lambda: spark.read.format("lake").load(lake.root)

    langs = sorted(r[0] for r in lake.read().select("lang").distinct().collect())
    target = langs[0]
    native_sel = lake.scan([("lang", "=", target)])
    sel_rows = native_sel.count()

    out = {
        "n_events": n_events,
        "state_rows": rows,
        "selective_rows": sel_rows,
        "count_native_sec": timeit(lambda: lake.read().count()),
        "count_datasource_sec": timeit(lambda: ds().count()),
        "agg_native_sec": timeit(
            lambda: lake.read().agg(F.sum(F.length("content"))).collect()
        ),
        "agg_datasource_sec": timeit(
            lambda: ds().agg(F.sum(F.length("content"))).collect()
        ),
        "selective_scan_native_sec": timeit(
            lambda: lake.scan([("lang", "=", target)]).count()
        ),
        "selective_datasource_sec": timeit(
            lambda: ds().where(F.col("lang") == target).count()
        ),
        "load_pre": load_pre,
        "load_post": os.getloadavg()[0],
    }
    path = os.path.join(os.path.dirname(__file__), "lake_ds_read.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
