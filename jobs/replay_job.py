#!/usr/bin/env python
"""spark-submit entry point for the CDC replay (the north rule's cluster
deployment mode):

    python jobs/package.py                       # -> dist/valentine_spark.zip
    spark-submit --py-files dist/valentine_spark.zip jobs/replay_job.py \
        --lake /path/to/lake --events 10000000 --batch-lsns 1000000 \
        [--stream-path /path/to/stream.parquet] [--resume] [--n-buckets 512]

With --stream-path the job tails/replays a parquet change stream (lsn-range
predicate pushdown per batch); without it, the deterministic synthetic
stream is generated executor-side.  On a cluster, spark-submit's --master /
--num-executors flags pick the cluster size; the job code is identical at
any N (no driver-side data paths).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--lake", required=True)
    parser.add_argument("--events", type=int, default=1_000_000)
    parser.add_argument("--n-keys", type=int, default=0, help="default events/10")
    parser.add_argument("--batch-lsns", type=int, default=1_000_000)
    parser.add_argument("--n-buckets", type=int, default=64)
    parser.add_argument("--stream-path", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("valentine-cdc-replay").getOrCreate()

    from valentine_spark.cdc import LakeTable, replay, resume_replay, synth_change_stream

    lake = LakeTable.open_or_create(args.lake, spark, n_buckets=args.n_buckets)

    if args.stream_path:
        stream = spark.read.parquet(args.stream_path)
    else:
        stream = synth_change_stream(
            spark, args.events, args.n_keys or max(args.events // 10, 1), seed=args.seed
        )
    # throughput must reflect the ACTUAL stream, not the --events default:
    # --stream-path replaces the synthetic stream entirely, and the count
    # is one cheap job next to the replay it measures
    n_events = stream.count()

    t0 = time.time()
    runner = resume_replay if args.resume else replay
    commits = runner(lake, stream, batch_lsns=args.batch_lsns)
    wall = time.time() - t0

    state = lake.state_checksum()
    print(
        json.dumps(
            {
                "commits": len([c for c in commits if not c.get("skipped")]),
                "skipped": len([c for c in commits if c.get("skipped")]),
                "wall_seconds": round(wall, 2),
                "events_total": n_events,
                "events_per_sec": round(n_events / wall, 1) if wall > 0 else None,
                "rows": state["rows"],
                "checksum": str(state["checksum"]),
                "version": lake.version,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
