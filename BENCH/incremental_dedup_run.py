#!/usr/bin/env python
"""Incremental MinHash-LSH maintenance vs batch recompute (the module's
reason to exist: a training-data pipeline cannot re-LSH the corpus on every
CDC batch).

Protocol: build an index over a D-doc synthetic code-like corpus (untimed),
then for each touch rate apply ONE delivery updating that fraction of docs
plus a few deletes, and time (a) the incremental path — index MERGE +
pair_delta materialization — vs (b) the batch path — minhash_lsh_pairs over
the full post-delivery corpus.  Equality is asserted every time: folding the
delta into the pre-delivery pair set must equal the recompute exactly.

The expected shape: batch cost is flat in the touch rate (always O(corpus)
shingle work); incremental cost scales with the delivery (changed-doc
shingles + two narrow band-column scans of the index), so the advantage
grows as deliveries get smaller relative to the corpus — the steady state of
a CDC tail.

Usage: python BENCH/incremental_dedup_run.py [n_docs] [--json out.json]
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import KEY_COLS, MinHashLshIndex
from valentine_spark.operators.dedup import minhash_lsh_pairs

N, K, BANDS = 8, 8, 4


def synth_docs(spark, n_docs: int, seed: int = 7):
    """Code-like docs in near-dup families, generated distributed (no
    driver-side corpus): family base = md5 chain over the family id, doc =
    base + small per-doc suffix.  ~600 chars per doc."""
    # ~5 docs per near-dup family: pair cardinality stays O(n_docs), not
    # O(n_docs^2 / families) — the corpus models scattered duplicates, not
    # a few giant clusters
    fam = (F.col("id") % max(1, n_docs // 5)).cast("string")
    chunk = [F.md5(F.concat(F.lit(f"fam{seed}-"), fam, F.lit(f"-{j}"))) for j in range(18)]
    base = F.concat_ws(" ", *chunk)
    suffix = F.when(F.col("id") % 7 == 0, F.md5(F.col("id").cast("string"))).otherwise(F.lit(""))
    return (
        spark.range(n_docs)
        .select(
            F.concat(F.lit("repo"), (F.col("id") % 64).cast("string")).alias("repo"),
            F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.lit("head").alias("commit"),
            F.concat(base, F.lit(" "), suffix).alias("content"),
            F.col("id"),
        )
    )


def pairs_set(df, cols):
    return {tuple(sorted([tuple(r[f"{c}_a"] for c in cols), tuple(r[f"{c}_b"] for c in cols)]))
            for r in df.collect()}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    load_pre = round(os.getloadavg()[0], 2)
    docs = synth_docs(spark, n_docs).persist()
    docs.count()
    root = tempfile.mkdtemp(prefix="ilsh_bench_")
    idx = MinHashLshIndex.create(
        os.path.join(root, "idx"), spark, n=N, k=K, bands=BANDS, n_buckets=64
    )
    # untimed bootstrap: the whole corpus as the first delivery
    idx.update(
        docs.select(F.lit("update").alias("change_op"), *KEY_COLS, "content"),
        batch_id="bootstrap",
    )
    results = {"n_docs": n_docs, "cpus": cpus, "loadavg_pre_1m": load_pre, "rates": []}
    rng = random.Random(11)
    state_mod = docs  # tracks current corpus content
    for rate in (0.005, 0.05):
        n_touch = max(1, int(n_docs * rate))
        # deterministic touched set: ids in [lo, lo+n_touch), new content
        lo = rng.randrange(0, n_docs - n_touch)
        touched = state_mod.where(F.col("id").between(lo, lo + n_touch - 1))
        delivery = touched.select(
            F.lit("update").alias("change_op"), *KEY_COLS,
            F.concat(F.col("content"), F.lit(f" rev{lo}")).alias("content"),
        )
        v0 = idx.version
        t0 = time.time()
        idx.update(delivery, batch_id=f"rate{rate}")
        delta = idx.pair_delta(v0)
        by_op = {r["pair_op"]: r["count"] for r in delta.groupBy("pair_op").count().collect()}
        n_added, n_removed = by_op.get("added", 0), by_op.get("removed", 0)
        inc_wall = time.time() - t0
        # post-delivery corpus state for the batch recompute
        state_mod = (
            state_mod.withColumn(
                "content",
                F.when(F.col("id").between(lo, lo + n_touch - 1),
                       F.concat(F.col("content"), F.lit(f" rev{lo}")))
                .otherwise(F.col("content")),
            ).persist()
        )
        t0 = time.time()
        batch = minhash_lsh_pairs(
            state_mod.select(
                F.concat_ws("\x1f", *KEY_COLS).alias("doc_id"),
                F.col("content").alias("text"),
            ),
            n=N, k=K, bands=BANDS,
        )
        n_batch = batch.count()
        batch_wall = time.time() - t0
        # exactness: index's full view at head == batch recompute count AND
        # set equality on a sample-free full compare via anti-joins
        idx_pairs = idx.pairs().select(
            F.concat_ws("\x1f", *[f"{c}_a" for c in KEY_COLS]).alias("pid_a"),
            F.concat_ws("\x1f", *[f"{c}_b" for c in KEY_COLS]).alias("pid_b"),
        )
        bpairs = batch.select(
            F.least("id_a", "id_b").alias("pid_a"), F.greatest("id_a", "id_b").alias("pid_b")
        )
        missing = bpairs.join(idx_pairs, ["pid_a", "pid_b"], "left_anti").count()
        extra = idx_pairs.join(bpairs, ["pid_a", "pid_b"], "left_anti").count()
        results["rates"].append({
            "touch_rate": rate, "touched_docs": n_touch,
            "incremental_wall": round(inc_wall, 2),
            "batch_wall": round(batch_wall, 2),
            "speedup": round(batch_wall / inc_wall, 2),
            "delta_added": int(n_added), "delta_removed": int(n_removed),
            "batch_pairs": int(n_batch),
            "exact_match": missing == 0 and extra == 0,
        })
        print(json.dumps(results["rates"][-1]))
    results["loadavg_post_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(results, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as fh:
            json.dump(results, fh, indent=2)


if __name__ == "__main__":
    main()
