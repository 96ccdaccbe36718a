"""Measure file-grain MERGE pruning: rewrite bytes must scale with the
batch's TOUCHED KEYS, not with bucket count x bucket size (VERDICT r2
perf-weak "bucket-grain COW" — fixed by khash-range pruning + match-confirm
in cdc/lake.py).

For each batch size K the script applies a K-event update batch to a
pre-loaded table and records:

  bytes_rewritten   what the file-grain MERGE actually rewrote
  bucket_cow_bytes  what bucket-grain COW (the round-2 design) would have
                    rewritten: every byte of every touched bucket
  table_bytes       full table size (what changed=ALL replay would rewrite)

plus an INSERT-ONLY batch (the dominant CDC op for this key — (repo, path,
commit) means every new commit is an insert) which must rewrite ZERO bytes,
and the final state checksum vs an untouched one-shot control replay.

Scaling law being evidenced: uniformly-random updates touch
~n_files x (1 - e^(-K/n_files)) files, so rewrite bytes grow with K and
saturate at the table size — they do NOT start there the way bucket-grain
COW does.  At 100 TB / ~10^5 files a realistic 10^3-key batch rewrites
~1% of the table instead of 100%.

Run:  python BENCH/merge_prune_bench.py [--events 200000] [--keys 100000]
Writes BENCH/merge_prune.json (one JSON doc, load-stamped).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import LakeTable, apply_batch, replay, synth_change_stream
from valentine_spark.cdc.lake import bucket_expr


def live_bytes(lake, buckets=None):
    files = lake._bucket_files(lake.metadata(), buckets)
    return sum(e["bytes"] for es in files.values() for e in es)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "merge_prune.json"))
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    workdir = tempfile.mkdtemp(prefix="merge_prune_")
    lake = LakeTable.create(
        os.path.join(workdir, "lake"), spark, n_buckets=8, target_file_rows=500
    )
    base = synth_change_stream(spark, args.events, args.keys, seed=42).cache()
    t0 = time.time()
    replay(lake, base, batch_lsns=args.events)
    load_s = time.time() - t0
    table_bytes = live_bytes(lake)
    n_files = sum(len(es) for es in lake._bucket_files(lake.metadata()).values())

    rows = []
    lsn = args.events
    for k_touch, kind in ((10, "update"), (100, "update"), (1_000, "update"), (10_000, "insert")):
        if kind == "update":
            # an update batch over K existing keys (same generator seed =>
            # the key universe matches the loaded table)
            batch = synth_change_stream(
                spark, k_touch, args.keys, seed=42, start_lsn=lsn
            ).where(F.col("op") != "delete")
        else:
            # brand-new keys (different seed): pure inserts — with
            # match-confirm pruning these must rewrite ZERO existing bytes
            batch = synth_change_stream(
                spark, k_touch, k_touch, seed=777, start_lsn=lsn
            ).where(F.col("op") != "delete")
        touched_buckets = sorted(
            r["_b"]
            for r in batch.select(
                bucket_expr(lake.metadata()["n_buckets"]).alias("_b")
            )
            .distinct()
            .collect()
        )
        bucket_cow = live_bytes(lake, touched_buckets)
        t0 = time.time()
        commit = apply_batch(
            lake, batch, f"touch-{k_touch}", watermark_lsn=lsn + k_touch - 1
        )
        wall = time.time() - t0
        lsn += k_touch
        rows.append(
            {
                "kind": kind,
                "touched_events": k_touch,
                "files_rewritten": commit["files_rewritten"],
                "bytes_rewritten": commit["bytes_rewritten"],
                "bucket_cow_bytes": bucket_cow,
                "table_bytes": table_bytes,
                "rewrite_frac_of_table": round(commit["bytes_rewritten"] / table_bytes, 4),
                "bucket_cow_frac_of_table": round(bucket_cow / table_bytes, 4),
                "merge_wall_s": round(wall, 2),
            }
        )
        print(json.dumps(rows[-1]))

    # ---- COW vs MoR under hot-random-key churn --------------------------
    # The regime file-grain COW still pays in: every batch touches K keys
    # scattered uniformly over the key space, so COW rewrites ~K files per
    # batch forever.  MoR appends O(batch) and defers resolution; the cost
    # moves to read (until compact).  Both tables replay the SAME churn;
    # checksums must match.
    churn_rows = []
    churn_batches = 8
    churn_k = 2_000
    cow2 = LakeTable.create(
        os.path.join(workdir, "cow2"), spark, n_buckets=8, target_file_rows=500
    )
    mor2 = LakeTable.create(
        os.path.join(workdir, "mor2"), spark, n_buckets=8, target_file_rows=500,
        write_mode="mor",
    )
    replay(cow2, base, batch_lsns=args.events, batch_id_prefix="load")
    replay(mor2, base, batch_lsns=args.events, batch_id_prefix="load")
    at2 = args.events
    for i in range(churn_batches):
        batch = synth_change_stream(
            spark, churn_k, args.keys, seed=42, start_lsn=at2
        )
        for name, tbl in (("cow", cow2), ("mor", mor2)):
            t0 = time.time()
            c = apply_batch(
                tbl, batch, f"churn-{i}", watermark_lsn=at2 + churn_k - 1,
                mode=name,
            )
            churn_rows.append(
                {
                    "mode": name,
                    "batch": i,
                    "touched_events": churn_k,
                    "bytes_rewritten": c["bytes_rewritten"],
                    "bytes_written": c.get("bytes_written", 0),
                    "wall_s": round(time.time() - t0, 2),
                }
            )
        at2 += churn_k
    churn_checksum_ok = cow2.state_checksum() == mor2.state_checksum()
    # read + maintenance costs on the MoR side
    t0 = time.time()
    mor2.read().count()
    mor_read_dirty_s = round(time.time() - t0, 2)
    t0 = time.time()
    mor2.compact()
    mor_compact_s = round(time.time() - t0, 2)
    t0 = time.time()
    mor2.read().count()
    mor_read_clean_s = round(time.time() - t0, 2)
    t0 = time.time()
    cow2.read().count()
    cow_read_s = round(time.time() - t0, 2)
    churn_summary = {
        "batches": churn_batches,
        "events_per_batch": churn_k,
        "cow_total_rewritten": sum(r["bytes_rewritten"] for r in churn_rows if r["mode"] == "cow"),
        "cow_total_written": sum(r["bytes_written"] for r in churn_rows if r["mode"] == "cow"),
        "mor_total_written": sum(r["bytes_written"] for r in churn_rows if r["mode"] == "mor"),
        "cow_merge_wall_s": round(sum(r["wall_s"] for r in churn_rows if r["mode"] == "cow"), 2),
        "mor_merge_wall_s": round(sum(r["wall_s"] for r in churn_rows if r["mode"] == "mor"), 2),
        "mor_read_dirty_s": mor_read_dirty_s,
        "mor_compact_s": mor_compact_s,
        "mor_read_clean_s": mor_read_clean_s,
        "cow_read_s": cow_read_s,
        "checksum_match": churn_checksum_ok,
    }
    print(json.dumps(churn_summary))

    # correctness control: one-shot replay of the identical event sequence
    control = LakeTable.create(os.path.join(workdir, "control"), spark, n_buckets=8)
    full = base
    at = args.events
    for k_touch, kind in ((10, "update"), (100, "update"), (1_000, "update"), (10_000, "insert")):
        seed, nk = (42, args.keys) if kind == "update" else (777, k_touch)
        full = full.unionByName(
            synth_change_stream(spark, k_touch, nk, seed=seed, start_lsn=at).where(
                F.col("op") != "delete"
            )
        )
        at += k_touch
    replay(control, full, batch_lsns=at, max_lsn=at - 1)
    checksum_ok = lake.state_checksum() == control.state_checksum()

    doc = {
        "bench": "merge_prune",
        "events": args.events,
        "keys": args.keys,
        "cpus": args.cpus,
        "n_files_after_load": n_files,
        "load_s": round(load_s, 2),
        "table_bytes": table_bytes,
        "rows": rows,
        "churn_rows": churn_rows,
        "churn_summary": churn_summary,
        "checksum_match_vs_control": checksum_ok,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({"written": args.out, "checksum_ok": checksum_ok}))
    spark.stop()


if __name__ == "__main__":
    main()
