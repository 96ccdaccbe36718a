#!/usr/bin/env python
"""Two-cluster-size scaling proxy for the DEDUP path — the second axis of
north-rule evidence (the first is CDC ingest/consume, `scaling_run.py` /
`consumer_scaling_run.py`).  Same protocol: one corpus built UNTIMED at
fixed parallelism and read by both levels, fresh taskset-pinned JVMs at N
and 4N cores, interleaved levels (lo,hi,lo,hi — host drift biases both
levels instead of corrupting the ratio), best-of-K per level, cross-level
result-checksum equality.

Two workloads with opposite plan shapes:

  * ``minhash_lsh_pairs`` — the shuffle-heavy case: explode shingles →
    signature agg → banded self-join (three exchanges);
  * ``repetition_stats`` — the map-only case: zero-shuffle array folds,
    reduced to one checksum row.  This one should sit AT the platform
    ceiling; the gap between the two isolates what shuffling costs.

Corpus: n_docs of 128 random hex chars (md5 chains keyed on id); every
50th doc is a near-copy of its predecessor (the true pairs).

Usage: python BENCH/dedup_scaling_run.py [n_docs] [--cpus 4,16]
       [--json out.json]     (SCALING_TMPFS, SCALING_TRIALS respected)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

BUILDER = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
path = sys.argv[1]; n_docs = int(sys.argv[2])
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
rnd = ("concat(md5(concat(base, ':0')), md5(concat(base, ':1')), "
       "md5(concat(base, ':2')), md5(concat(base, ':3')))")
docs = (spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.when(F.pmod("id", 50) == 1, F.col("id") - 1)
     .otherwise(F.col("id")).cast("string").alias("base"))
    .select("doc_id", F.concat(F.expr(rnd),
        F.when(F.pmod("doc_id", 50) == 1, F.lit("VARIANT1"))
         .otherwise(F.lit(""))).alias("text")))
docs.repartition(32).write.parquet(path)
print("BUILT")
"""

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
cpus = int(sys.argv[1]); path = sys.argv[2]
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
spark.sparkContext.setLogLevel("ERROR")
from valentine_spark.operators.dedup import minhash_lsh_pairs
from valentine_spark.operators.text import repetition_stats

docs = spark.read.parquet(path)

def pairs_checksum():
    p = minhash_lsh_pairs(docs, n=8, k=8, bands=4)
    row = p.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.xxhash64("id_a", "id_b").cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"] or 0)

# the map-only arm runs on a 50x replicated view of the same corpus
# (explode, zero extra storage): at n_docs (and still at 10x) the
# zero-shuffle pass finishes in a couple of seconds at the 4N level and
# the measurement is mostly job-launch overhead, not scaling — v1/v2 of
# this harness recorded meaningless 0.35/0.47 that way
docs_rep = docs.select(
    "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(49))).alias("rep")
).select((F.col("doc_id") * 50 + F.col("rep")).alias("doc_id"), "text")

def rep_checksum():
    r = repetition_stats(docs_rep)
    row = r.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.xxhash64(*[F.col(c).cast("string") for c in r.columns])
              .cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"] or 0)

# JIT/codegen warmup on a slice
w = docs.limit(20_000).cache(); w.count()
minhash_lsh_pairs(w, n=8, k=8, bands=4).count()
repetition_stats(w).agg(F.sum("n_words")).collect()
w.unpersist()

n_trials = int(os.environ.get("SCALING_TRIALS", "2"))
mh_walls, mh_sig = [], None
rep_walls, rep_sig = [], None
for _ in range(n_trials):
    t0 = time.time(); mh_sig = pairs_checksum(); mh_walls.append(time.time() - t0)
    t0 = time.time(); rep_sig = rep_checksum(); rep_walls.append(time.time() - t0)

print("RESULT " + json.dumps({{
    "cpus": cpus,
    "minhash_wall": min(mh_walls), "minhash_walls": mh_walls,
    "minhash_pairs": mh_sig[0], "minhash_checksum": str(mh_sig[1]),
    "repstats_wall": min(rep_walls), "repstats_walls": rep_walls,
    "repstats_rows": rep_sig[0], "repstats_checksum": str(rep_sig[1]),
}}))
"""


def _run(cmd, timeout=3600):
    return subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)


def run_level(repo: str, cpus: int, path: str) -> dict:
    cmd = [sys.executable, "-c", WORKER.format(repo=repo), str(cpus), path]
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
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 500_000
    lo, hi = 4, 16
    if "--cpus" in sys.argv:
        lo, hi = (int(x) for x in sys.argv[sys.argv.index("--cpus") + 1].split(","))
    factor = hi / lo
    tmpfs = os.environ.get("SCALING_TMPFS")
    if tmpfs:
        os.makedirs(tmpfs, exist_ok=True)
    root = tempfile.mkdtemp(prefix="dedup_scale_", dir=tmpfs or None)
    path = os.path.join(root, "docs")
    load_pre = round(os.getloadavg()[0], 2)
    try:
        out = _run([sys.executable, "-c", BUILDER.format(repo=repo), path, str(n_docs)])
        if "BUILT" not in out.stdout:
            raise RuntimeError(f"builder failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")

        def _better(a, b):
            if a is None:
                return b
            best = dict(a if a["minhash_wall"] <= b["minhash_wall"] else b)
            for k in ("minhash_wall", "repstats_wall"):
                best[k] = min(a[k], b[k])
            for k in ("minhash_walls", "repstats_walls"):
                best[k] = a[k] + b[k]
            return best

        rounds = int(os.environ.get("SCALING_INTERLEAVE", "2"))
        r_lo = r_hi = None
        for _ in range(max(1, rounds)):
            r_lo = _better(r_lo, run_level(repo, lo, path))
            r_hi = _better(r_hi, run_level(repo, hi, path))
        load_post = round(os.getloadavg()[0], 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)

    for k in ("minhash_checksum", "repstats_checksum", "minhash_pairs", "repstats_rows"):
        assert r_lo[k] == r_hi[k], (k, r_lo[k], r_hi[k])
    result = {
        "n_docs": n_docs,
        f"local{lo}": r_lo,
        f"local{hi}": r_hi,
        "minhash_efficiency": round(
            r_lo["minhash_wall"] / (factor * r_hi["minhash_wall"]), 3
        ),
        "repstats_efficiency": round(
            r_lo["repstats_wall"] / (factor * r_hi["repstats_wall"]), 3
        ),
        "checksums_match": True,
        "load_pre": load_pre,
        "load_post": load_post,
    }
    print(json.dumps(result, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
