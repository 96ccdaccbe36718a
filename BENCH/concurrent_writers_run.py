#!/usr/bin/env python
"""Multi-writer commit-protocol overhead bench: K optimistic writers racing
key-disjoint slices of the same change stream into ONE lake table vs the
same slices applied serially by one writer — same Spark session, same total
work, MoR and COW arms.

What it measures (and what it cannot): the writers share one local[CPUS]
JVM, so this is NOT a test of aggregate cluster throughput — it isolates
the PROTOCOL cost: install-race retries (cheap metadata rebases), body
re-runs (COW conflicts re-execute Spark work), and the wall-clock delta vs
serial application of identical batches.  The expected shape:

* MoR concurrent ~= MoR serial (rebases re-derive bookkeeping only; the
  Spark jobs of the K writers interleave on the same executor pool); all
  install losers rebase for free.
* COW concurrent pays body re-runs whenever racing batches touch shared
  buckets (hash-sliced keys touch ALL buckets, the worst case) — the
  honest guidance this records: concurrent INGEST writers should use MoR
  (or bucket-disjoint routing); COW is the single-writer/compactor mode.

Correctness is asserted in-run: every arm must produce the identical
state checksum.

Usage: python BENCH/concurrent_writers_run.py [n_events] [n_writers]
       [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4_000_000
N_WRITERS = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 4
OUT = None
if "--json" in sys.argv:
    OUT = sys.argv[sys.argv.index("--json") + 1]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from valentine_spark.cdc import LakeTable, apply_batch, synth_change_stream
    from valentine_spark.cdc import lake as lake_mod
    from valentine_spark.cdc.generator import KEY_COLS

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    stream = synth_change_stream(spark, N_EVENTS, max(N_EVENTS // 10, 1000), seed=5)
    slices = [
        stream.where(F.pmod(F.xxhash64(*KEY_COLS), F.lit(N_WRITERS)) == i).cache()
        for i in range(N_WRITERS)
    ]
    for s in slices:
        s.count()  # materialize outside the timed window

    base = tempfile.mkdtemp(prefix="conc_bench_")
    result: dict = {
        "n_events": N_EVENTS,
        "n_writers": N_WRITERS,
        "cpus": CPUS,
        "load_pre": round(os.getloadavg()[0], 2),
        "arms": {},
    }
    checksums = {}

    def run_arm(name: str, mode: str, concurrent: bool) -> None:
        root = os.path.join(base, name)
        lake = LakeTable.create(root, spark, n_buckets=16, write_mode=mode)
        stats: dict = {}
        lake_mod.CONFLICT_STATS = stats
        t0 = time.time()
        if concurrent:
            barrier = threading.Barrier(N_WRITERS)
            errors: list = []

            def writer(i: int) -> None:
                try:
                    h = LakeTable(root, spark)
                    barrier.wait()
                    apply_batch(h, slices[i], f"w-{i}")
                except Exception as e:  # noqa: BLE001
                    errors.append(e)

            ts = [threading.Thread(target=writer, args=(i,)) for i in range(N_WRITERS)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            if errors:
                raise errors[0]
        else:
            for i in range(N_WRITERS):
                apply_batch(lake, slices[i], f"w-{i}")
        wall = time.time() - t0
        lake_mod.CONFLICT_STATS = None
        checksums[name] = lake.state_checksum()
        result["arms"][name] = {
            "wall_sec": round(wall, 2),
            "events_per_sec": round(N_EVENTS / wall, 1),
            "install_retries": stats.get("install_retries", 0),
            "body_retries": stats.get("body_retries", 0),
            "version": lake.version,
        }
        print(name, result["arms"][name], flush=True)

    run_arm("mor_serial", "mor", concurrent=False)
    run_arm("mor_concurrent", "mor", concurrent=True)
    run_arm("cow_serial", "cow", concurrent=False)
    run_arm("cow_concurrent", "cow", concurrent=True)

    assert len({json.dumps(c, sort_keys=True) for c in checksums.values()}) == 1, checksums
    result["state_checksum"] = checksums["mor_serial"]
    result["load_post"] = round(os.getloadavg()[0], 2)
    print(json.dumps(result))
    if OUT:
        with open(OUT, "w") as fh:
            json.dump(result, fh, indent=1)


if __name__ == "__main__":
    main()
