#!/usr/bin/env python
"""Churn-proportionality proof for incremental view maintenance
(`cdc/ivm.py`): maintain a per-lang (count, sum, min, max) view through one
changelog window of varying churn and compare against the from-scratch
recompute the view replaces.

The claim under test (README / OPERATIONS): IVM cost scales with CHURN,
never table size — count/sum by pure delta rules, min/max by selective
group rescan.  Timings are SPLIT: the changelog diff (``lake.changes``) is
shared infrastructure every consumer already pays (a follower hands the
same delivery to the mirror and the view), so the view's marginal cost is
``maintain_sec`` given a materialized diff; ``diff_sec`` is reported
alongside.  Honest caveats measured rather than hidden: (a) churn here is
key-spread, so the diff touches every bucket — its cost is the worst case,
clustered churn prunes; (b) the fixture has only a handful of lang groups,
so a window that retracts an extreme rescans a large FRACTION of this
small table — production group cardinality shrinks the rescanned share.

Each level runs in a fresh subprocess JVM (house protocol); equality of
the maintained view vs the recompute is asserted per level.

Usage: python BENCH/ivm_run.py [n_events] [--json out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
n = int(sys.argv[1]); churn_n = int(sys.argv[2])
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from valentine_spark.cdc import (
    LakeTable, apply_batch, init_aggregate, maintain_aggregate,
    synth_change_stream,
)

n_keys = n // 4
base_stream = synth_change_stream(spark, n, n_keys, seed=71)
churn_stream = (
    synth_change_stream(spark, churn_n, n_keys, seed=72)
    .withColumn("lsn", F.col("lsn") + n)
)

root = tempfile.mkdtemp(prefix="ivm_bench_")
lake = LakeTable.create(os.path.join(root, "t"), spark, n_buckets=16)
apply_batch(lake, base_stream, "base")

# hval is a ~uniform 64-bit image of the content: a production-like
# CONTINUOUS measure where a random retraction rarely ties a group's
# extreme, so the selective rescan stays selective.  (A narrow-support
# measure like length(content) -- two distinct values in this fixture --
# would tie every window and degrade min/max IVM to recompute-per-window;
# that regime is the documented caveat, not the common case.)
measures = {{
    "files": ("count", None),
    "bytes": ("sum", "clen"),
    "min_h": ("min", "hval"),
    "max_h": ("max", "hval"),
}}
measures_cs = {{"files": ("count", None), "bytes": ("sum", "clen")}}

def prep(df):
    out = (df.withColumn("clen", F.length(F.coalesce(F.col("content"), F.lit(""))))
             .withColumn("hval", F.xxhash64(F.col("content"))))
    if "_before_content" in df.columns:
        out = (out.withColumn(
                   "_before_clen", F.length(F.coalesce(F.col("_before_content"), F.lit(""))))
                  .withColumn("_before_hval", F.xxhash64(F.col("_before_content"))))
    return out

agg = init_aggregate(prep(lake.read()), ["lang"], measures).cache()
agg.count()

v = lake.version
apply_batch(lake, churn_stream, "churn")

# split timings: the changelog diff is SHARED infrastructure (a follower
# already extracts it for every consumer; IVM rides the same delivery), so
# the view's marginal cost is the maintain step given a materialized diff
t0 = time.time()
chg = prep(lake.changes(v, include_before=True)).persist()
n_chg = chg.count()
t_diff = time.time() - t0

t0 = time.time()
rolled = maintain_aggregate(
    agg, chg, ["lang"], measures, base=prep(lake.read())
).cache()
rolled.count()
t_maintain = time.time() - t0

# pure-delta path (count/sum only): no rescan, no base scan
agg_cs = init_aggregate(prep(lake.read(version=v)), ["lang"], measures_cs).cache()
agg_cs.count()
t0 = time.time()
rolled_cs = maintain_aggregate(agg_cs, chg, ["lang"], measures_cs).cache()
rolled_cs.count()
t_maintain_cs = time.time() - t0
chg.unpersist()

t0 = time.time()
fresh = init_aggregate(prep(lake.read()), ["lang"], measures).cache()
fresh.count()
t_recompute = time.time() - t0

got = sorted(tuple(r) for r in rolled.collect())
want = sorted(tuple(r) for r in fresh.collect())
assert got == want, f"IVM diverged from recompute at churn={{churn_n}}"
cs_got = sorted((r["lang"], r["files"], r["bytes"]) for r in rolled_cs.collect())
cs_want = sorted((r["lang"], r["files"], r["bytes"]) for r in fresh.collect())
assert cs_got == cs_want, "count/sum IVM diverged"

print("RESULT " + json.dumps({{
    "n_events": n, "table_rows": fresh.agg(F.sum("files")).collect()[0][0],
    "churn_events": churn_n, "changelog_rows": n_chg,
    "diff_sec": round(t_diff, 2),
    "maintain_minmax_sec": round(t_maintain, 2),
    "maintain_cs_sec": round(t_maintain_cs, 2),
    "recompute_sec": round(t_recompute, 2),
    "n_groups": len(got),
}}))
"""


def run_level(repo: str, n_events: int, churn_events: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo), str(n_events), str(churn_events)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker churn={churn_events} failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}"
    )


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 8_000_000
    load_pre = round(os.getloadavg()[0], 2)
    # axis 1: churn sweep at fixed table size — maintain tracks churn
    results = [
        run_level(repo, n_events, c)
        for c in (n_events // 1000, n_events // 100, n_events // 10)
    ]
    # axis 2: table-size sweep at fixed ABSOLUTE churn — THE claim:
    # recompute grows with the table, maintain does not
    size_results = [
        run_level(repo, n, n_events // 100)
        for n in (n_events // 4, n_events, n_events * 4)
    ]
    out = {"n_events": n_events, "levels": results, "size_levels": size_results,
           "load_pre": load_pre, "load_post": round(os.getloadavg()[0], 2)}
    print(json.dumps(out, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
