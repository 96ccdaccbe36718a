#!/usr/bin/env python
"""Two-cluster-size scaling proxy for the GENERAL MERGE INTO path
(round-4 surface: cdc/merge_into.py), same protocol as
consumer_scaling_run.py: one source lake built ONCE by an untimed worker
at fixed parallelism, fresh taskset-pinned JVMs at N and 4N cores,
interleaved levels (lo,hi,lo,hi — host drift biases both levels, never
the ratio), best-of-trials, cross-level result-checksum equality.

Isolation trick: each timed trial runs the MERGE on an O(1) metadata
BRANCH of the shared table (create_branch / delete_branch), so every
trial mutates a fresh fork of the identical file set and the shared
build is never copied — which also exercises the branch machinery at
bench scale.

The merge shape is the realistic backfill: ~1/6 of keys updated with a
condition on the current row, a slice deleted, ~5% brand-new keys
inserted.  The source is pre-materialized to parquet by the builder so
both levels read identical bytes.

Usage: python BENCH/merge_into_scaling_run.py [n_events] [--cpus 4,16]
       [--json out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

BUILDER = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
root = sys.argv[1]; n = int(sys.argv[2])
tmpfs = os.environ.get("SCALING_TMPFS")
builder = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
if tmpfs:
    builder = builder.config("spark.local.dir", os.path.join(tmpfs, "spark_local_b"))
spark = builder.getOrCreate()
from valentine_spark.cdc import LakeTable, replay, synth_change_stream
src = LakeTable.create(os.path.join(root, "src"), spark, n_buckets=64)
stream = synth_change_stream(spark, n, n // 4)
replay(src, stream, batch_lsns=n // 8, max_lsn=n - 1)
# merge source: updates for keys ending in a digit bucket, inserts of new keys
cur = src.read()
upd = (cur.where(F.xxhash64("repo", "path", "commit") % 6 == 0)
          .select("repo", "path", "commit",
                  F.lit("patched").alias("lang"),
                  F.concat(F.lit("P:"), F.coalesce("content", F.lit(""))).alias("content")))
new = (cur.where(F.xxhash64("repo", "path", "commit") % 20 == 1)
          .select(F.concat(F.lit("new/"), "repo").alias("repo"), "path", "commit",
                  F.lit("fresh").alias("lang"), F.lit("seed").alias("content")))
upd.unionByName(new).repartition(8).write.mode("overwrite").parquet(os.path.join(root, "merge_src"))
print("BUILT " + json.dumps({{"rows": src.state_checksum()["rows"], "version": src.version}}))
"""

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
cpus = int(sys.argv[1]); root = sys.argv[2]; trial_tag = sys.argv[3]
builder = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
tmpfs = os.environ.get("SCALING_TMPFS")
if tmpfs:
    tempfile.tempdir = tmpfs
    builder = builder.config("spark.local.dir",
                             os.path.join(tmpfs, f"spark_local_{{cpus}}"))
spark = builder.getOrCreate()
from valentine_spark.cdc import LakeTable
lake = LakeTable(os.path.join(root, "src"), spark)
msrc = spark.read.parquet(os.path.join(root, "merge_src"))
msrc.count()  # warm the source scan (input bytes identical across levels)

n_trials = int(os.environ.get("SCALING_TRIALS", "2"))
walls, sig = [], None
counts = None
for t in range(n_trials):
    bname = f"mi-{{trial_tag}}-{{cpus}}-{{t}}"
    b = lake.create_branch(bname)
    t0 = time.time()
    res = (b.merge_into(msrc)
           .when_matched_delete(condition=F.col("t.lang") == F.lit("rust"))
           .when_matched_update({{"lang": F.col("s.lang"), "content": F.col("s.content")}})
           .when_not_matched_insert()
           .execute(batch_id=bname, assume_unique=True))
    walls.append(time.time() - t0)
    counts = {{k: res[k] for k in ("rows_updated", "rows_deleted", "rows_inserted",
                                   "files_rewritten")}}
    st = b.read()
    row = st.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                           for c in ["repo","path","commit","lang","content"]]
                         ).cast("decimal(38,0)")).alias("h")).collect()[0]
    sig = (int(row["c"]), int(row["h"] or 0))
    lake.delete_branch(bname)

print("RESULT " + json.dumps({{
    "cpus": cpus, "wall": min(walls), "walls": walls,
    "result_rows": sig[0], "result_checksum": str(sig[1]),
    "counts": counts,
}}))
"""


def _run(cmd, timeout=3000):
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)


def run_level(repo: str, cpus: int, root: str, tag: str) -> dict:
    script = WORKER.format(repo=repo)
    cmd = [sys.executable, "-c", script, str(cpus), root, tag]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = _run(cmd)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8_000_000
    lo, hi = 4, 16
    if "--cpus" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--cpus") + 1].split(","))
    factor = hi / lo
    tmpfs = os.environ.get("SCALING_TMPFS")
    if tmpfs:
        os.makedirs(tmpfs, exist_ok=True)
    root = tempfile.mkdtemp(prefix="mi_src_", dir=tmpfs or None)
    load_pre = round(os.getloadavg()[0], 2)
    try:
        out = _run([sys.executable, "-c", BUILDER.format(repo=repo), root, str(n_events)])
        built = None
        for line in out.stdout.splitlines():
            if line.startswith("BUILT "):
                built = json.loads(line[len("BUILT "):])
        if built is None:
            raise RuntimeError(f"builder failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")
        rounds = int(os.environ.get("SCALING_INTERLEAVE", "2"))
        r_lo = r_hi = None

        def _better(a, b):
            if a is None:
                return b
            best = dict(a if a["wall"] <= b["wall"] else b)
            best["walls"] = a["walls"] + b["walls"]
            return best

        for i in range(max(1, rounds)):
            r_lo = _better(r_lo, run_level(repo, lo, root, f"r{i}a"))
            r_hi = _better(r_hi, run_level(repo, hi, root, f"r{i}b"))
        load_post = round(os.getloadavg()[0], 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    if r_lo["result_checksum"] != r_hi["result_checksum"]:
        raise RuntimeError(
            f"cross-level result mismatch: {r_lo['result_checksum']} vs "
            f"{r_hi['result_checksum']}"
        )
    result = {
        "n_events": n_events,
        "table_rows": built["rows"],
        f"local{lo}": r_lo,
        f"local{hi}": r_hi,
        "efficiency": round(r_lo["wall"] / (factor * r_hi["wall"]), 3),
        "result_checksum_match": True,
        "loadavg_pre_1m": load_pre,
        "loadavg_post_1m": load_post,
    }
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
