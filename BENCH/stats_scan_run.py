"""Measure secondary-column data skipping (LakeTable.scan + stats_cols +
OPTIMIZE-style sort compaction): a selective predicate over a re-clustered
table must cost O(matching files), not O(all files).

Arms, all over the SAME table state (equality of results asserted in-run):

  read_filter        read() + DataFrame filter on the khash-clustered
                     layout (Spark parquet row-group pushdown only — every
                     file is listed, planned, footer-fetched)
  scan_unclustered   scan() before sort-compaction: bounds are wide, so
                     pruning keeps ~all files — the honest no-win case
  scan_clustered     scan() after compact(sort_cols=[...]): manifest
                     pruning removes non-matching files from the plan

Recorded per arm: wall, rows, files entering the plan (inputFiles), plus
prune_preview's kept/total and bytes kept/total from the manifests.

Scaling law evidenced: after re-clustering, a predicate selecting fraction
f of the value space reads ~f x n_files + n_buckets files (one boundary
file per bucket).  At 10^5 files a 1/8-selective predicate plans ~12.5% of
the files; the unclustered arms plan 100% regardless of selectivity.

Run:  python BENCH/stats_scan_run.py [--events 4000000] [--keys 1000000]
Writes BENCH/stats_scan.json (one JSON doc, load-stamped).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import LakeTable, replay, synth_change_stream


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--keys", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "stats_scan.json"))
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    load_pre = os.getloadavg()[0]

    root = tempfile.mkdtemp(prefix="stats_scan_")
    n_buckets = 16
    # ~8 files per bucket so per-file bounds have something to prune
    file_rows = max(args.keys // (n_buckets * 8), 2_000)
    lake = LakeTable.create(
        os.path.join(root, "t"), spark, n_buckets=n_buckets,
        target_file_rows=file_rows, stats_cols=["lang"],
    )
    stream = synth_change_stream(spark, args.events, args.keys, seed=5)
    t0 = time.time()
    replay(lake, stream, batch_lsns=args.events // 4)
    load_sec = time.time() - t0

    where = [("lang", "=", "rust")]
    pred = F.col("lang") == "rust"

    def timed(df):
        t = time.time()
        n = df.count()
        return round(time.time() - t, 3), n, len(set(df.inputFiles()))

    doc = {
        "n_events": args.events, "n_keys": args.keys, "cpus": args.cpus,
        "load_pre": load_pre, "load_sec": round(load_sec, 1), "arms": {},
    }

    def record(name, df, pv):
        wall, rows, files = timed(df)
        doc["arms"][name] = {
            "wall_sec": wall, "rows": rows, "files_planned": files,
            "kept_files": pv["kept_files"], "total_files": pv["total_files"],
        }
        return rows

    rows_a = record("read_filter", lake.read().where(pred),
                    {"kept_files": None, "total_files": None})
    rows_b = record("scan_unclustered", lake.scan(where), lake.prune_preview(where))

    t0 = time.time()
    lake.compact(min_files=1, sort_cols=["lang"])
    doc["compact_sort_sec"] = round(time.time() - t0, 1)

    rows_c = record("scan_clustered", lake.scan(where), lake.prune_preview(where))
    rows_d = record("read_filter_clustered", lake.read().where(pred),
                    {"kept_files": None, "total_files": None})

    assert rows_a == rows_b == rows_c == rows_d, (rows_a, rows_b, rows_c, rows_d)
    files = lake._bucket_files(lake.metadata())
    doc["table_bytes"] = sum(e["bytes"] for es in files.values() for e in es)
    doc["load_post"] = os.getloadavg()[0]
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
