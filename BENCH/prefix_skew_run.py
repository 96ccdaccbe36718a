#!/usr/bin/env python
"""Crossover proof for the prefix-filtered set-similarity join
(VERDICT r2 #8): on a UNIFORM corpus the exhaustive df>=2 join wins
(BENCH/BASELINE.md §3), so when does the prefix filter earn its extra
df/rank/verify joins?  Answer: under boilerplate skew — when one snippet
(and therefore its ~57 shingles) appears in a large fraction of documents,
the exhaustive join's candidate volume is quadratic in the hot shingle's
document frequency, while the prefix filter never joins on hot shingles at
all (a hot shingle is by definition not among a document's RAREST
shingles, so it cannot enter any prefix unless the document is nearly all
boilerplate).

Corpus (fully deterministic, synthesized in-Spark, no Python data plane):
  * n_docs documents of 128 random hex chars (md5 chains keyed on id);
  * every 50th document is a near-copy of its predecessor (append 8 chars:
    char-8-gram Jaccard ~0.94) — the true pairs both paths must find;
  * ``boiler_pct`` % of documents share ONE 64-char boilerplate suffix
    (57 shared shingles with df = boiler_pct/100 * n_docs).

Both paths are run LOSSLESS (no max_shingle_df) and must return identical
pair sets; a third column shows the lossy df-cut mitigation
(max_shingle_df=100) for reference.  Results + load stamps land in
``prefix_skew.json`` and the table in BENCH/BASELINE.md §3.

Usage: python BENCH/prefix_skew_run.py [n_docs] [--json out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
n_docs = int(sys.argv[1]); boiler_pct = int(sys.argv[2])
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from valentine_spark.operators.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_prefix

BOILER = "".join(chr(ord('a') + (i * 7) % 26) for i in range(64))
rnd = "concat(md5(concat(base, ':0')), md5(concat(base, ':1')), md5(concat(base, ':2')), md5(concat(base, ':3')))"
docs = (
    spark.range(n_docs)
    .select(
        F.col("id").alias("doc_id"),
        # every 50th doc shares its predecessor's random part + an 8-char tail
        F.when(F.pmod("id", 50) == 1, F.col("id") - 1).otherwise(F.col("id")).cast("string").alias("base"),
        (F.pmod(F.xxhash64("id", F.lit(99)), 100) < boiler_pct).alias("has_boiler"),
    )
    .select(
        "doc_id",
        F.concat(
            F.expr(rnd),
            F.when(F.pmod("doc_id", 50) == 1, F.lit("VARIANT1")).otherwise(F.lit("")),
            F.when(F.col("has_boiler"), F.lit(BOILER)).otherwise(F.lit("")),
        ).alias("text"),
    )
    .cache()
)
docs.count()

t0 = time.time()
exact_pairs = {{tuple(r) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}}
t_exhaustive = time.time() - t0

t0 = time.time()
prefix_pairs = {{tuple(r) for r in ngram_jaccard_pairs_prefix(docs, threshold=0.8).collect()}}
t_prefix = time.time() - t0
assert prefix_pairs == exact_pairs, (len(prefix_pairs), len(exact_pairs))

t0 = time.time()
n_dfcut = ngram_jaccard_pairs(docs, threshold=0.8, max_shingle_df=100).count()
t_dfcut = time.time() - t0

print("RESULT " + json.dumps({{
    "boiler_pct": boiler_pct, "n_pairs": len(exact_pairs),
    "exhaustive_sec": round(t_exhaustive, 2), "prefix_sec": round(t_prefix, 2),
    "dfcut_sec": round(t_dfcut, 2), "dfcut_pairs": n_dfcut,
}}))
"""


def run_level(repo: str, n_docs: int, boiler_pct: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo), str(n_docs), str(boiler_pct)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker boiler={boiler_pct} failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 6000
    load_pre = round(os.getloadavg()[0], 2)
    results = [run_level(repo, n_docs, pct) for pct in (0, 10, 25, 50)]
    out = {"n_docs": n_docs, "levels": results,
           "load_pre": load_pre, "load_post": round(os.getloadavg()[0], 2)}
    print(json.dumps(out, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
