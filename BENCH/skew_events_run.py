#!/usr/bin/env python
"""Skew robustness of the per-user WINDOW operators (sessionize, as-of
join) — the event-stream counterpart of BENCH §2's LWW skew table.

Synthesizes an event stream where ONE user receives ``hot_share`` of all
events (0 / 10 / 50 %), then times

  * ``sessionize`` — per-user sort window + running session-id sum; unlike
    LWW (which Catalyst rewrites to a partial group-limit), sessionization
    is inherently sequential per user: the hot user IS one sorted window
    partition, so the hot partition's sort is the floor on wall time;
  * ``asof_join`` — purchases attributed to latest click per user; same
    union+window shuffle shape.

What "holding under skew" means here: wall time grows at most linearly in
the hot key's share (single-partition sort of the hot user's rows, O(h log
h)), with NO collapse to a global single partition and NO OOM — the hot
partition spills if needed.  A real fix for a pathological key (one user =
half the planet) is APPLICATION-level splitting (e.g. sessionize per
(user, day) then stitch boundary sessions); recorded here as measured
behaviour, not hidden.

Usage: python BENCH/skew_events_run.py [n_events] [--json out.json]
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
n = int(sys.argv[1]); hot_pct = int(sys.argv[2])
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false").getOrCreate())
from valentine_spark.operators import asof_join, sessionize

n_users = 10_000
ev = spark.range(n).select(
    F.col("id").alias("event_id"),
    F.when(F.pmod(F.col("id"), 100) < hot_pct, F.lit(0))
     .otherwise(F.pmod(F.xxhash64("id"), n_users - 1) + 1).alias("user_id"),
    F.timestamp_seconds(F.lit(1_600_000_000) + F.pmod(F.xxhash64("id", F.lit(1)), 30*86400)).alias("ts"),
    F.element_at(F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
                 (F.pmod(F.xxhash64("id", F.lit(2)), 3) + 1).cast("int")).alias("event_type"),
    (F.pmod(F.xxhash64("id", F.lit(3)), 1000) / 10.0).alias("value"),
)

from valentine_spark.operators.window_ops import sessionize_sliced

t0 = time.time()
n_sessions = sessionize(ev, gap_minutes=30).count()
t_sess = time.time() - t0

t0 = time.time()
n_sessions_sliced = sessionize_sliced(ev, gap_minutes=30).count()
t_sess_sliced = time.time() - t0
assert n_sessions_sliced == n_sessions, (n_sessions_sliced, n_sessions)

purchases = ev.where(F.col("event_type") == "purchase")
clicks = (ev.where(F.col("event_type") == "click")
            .select("user_id", "ts", F.col("event_id").alias("click_event_id")))
t0 = time.time()
n_attr = asof_join(purchases, clicks, on=["user_id"], left_on="ts",
                   right_cols=["click_event_id"]).count()
t_asof = time.time() - t0
print("RESULT " + json.dumps({{"hot_pct": hot_pct, "sessionize_sec": round(t_sess, 2),
                               "sessionize_sliced_sec": round(t_sess_sliced, 2),
                               "n_sessions": n_sessions, "asof_sec": round(t_asof, 2),
                               "n_attributed": n_attr}}))
"""


def run_level(repo: str, n_events: int, hot_pct: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=repo), str(n_events), str(hot_pct)],
        capture_output=True, text=True, timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker hot={hot_pct} failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16_000_000
    load_pre = round(os.getloadavg()[0], 2)
    results = [run_level(repo, n_events, pct) for pct in (0, 10, 50)]
    out = {"n_events": n_events, "levels": results,
           "load_pre": load_pre, "load_post": round(os.getloadavg()[0], 2)}
    print(json.dumps(out, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
