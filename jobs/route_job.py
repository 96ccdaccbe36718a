#!/usr/bin/env python
"""spark-submit entry point for multi-table WAL ingest (cdc/router.py —
one binlog tail fanned out to N lake tables, per-table exactly-once):

    python jobs/package.py                       # -> dist/valentine_spark.zip
    spark-submit --py-files dist/valentine_spark.zip jobs/route_job.py \
        --lake-root /path/to/lakes --raw-path /path/to/envelopes.parquet \
        --tables-config tables.json [--batch-lsns 1000000] [--parallelism 4] \
        [--dlq-path /path/to/quarantine]

``tables.json`` maps table name -> DDL payload schema, e.g.
``{"files": "repo string, path string, commit string, lang string,
content string"}``; each table's lake lives at ``<lake-root>/<name>``.
``--raw-path`` reads a parquet of Maxwell JSON envelopes (column
``value``; pass ``--raw-format text`` for newline-delimited JSON files).
Without it, a deterministic synthetic multi-table envelope stream is
generated executor-side (``--events``, ``--n-tables``) — the self-
contained benchmark/demo mode.

Re-running after a crash is a no-op for already-committed (slice, table)
pairs — the per-table manifests carry exactly-once, no job-level state.
``--dlq-path`` appends the dead letters (table, raw, reason) as parquet —
the quarantine a production tail must keep (malformed envelopes must
never abort the batch NOR vanish).

``--mode streaming`` tails the ``--raw-path`` drop zone as a Structured
Streaming source instead (availableNow catch-up then exit — cron-style):
Spark's checkpoint (``--checkpoint``) numbers the micro-batches and every
table commits under ``{stream-N}/{table}``, so restarts and replays are
exactly-once per (micro-batch, table); the DLQ becomes per-batch
overwrite dirs under ``--dlq-path``.  Files must arrive with increasing
mtimes (WAL-shipping order — see streaming/stream.py ``stream_route``).
"""

from __future__ import annotations

import argparse
import json
import time


def synth_envelopes(spark, n_events: int, n_keys: int, n_tables: int, seed: int):
    """Deterministic multi-table Maxwell envelope stream: wrap the synthetic
    change stream, assigning each KEY to one of ``n_tables`` tables by hash
    (a real binlog interleaves tables; one key never moves between them).
    All JVM expressions — zero Python in the data plane."""
    from pyspark.sql import functions as F

    from valentine_spark.cdc import synth_change_stream

    ev = synth_change_stream(spark, n_events, n_keys, seed=seed)
    tbl = F.concat(
        F.lit("t"), F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(n_tables))
    )
    return ev.select(
        F.to_json(
            F.struct(
                F.lit("gh").alias("database"),
                tbl.alias("table"),
                F.when(F.col("op") == "delete", F.lit("delete"))
                .otherwise(F.lit("update"))
                .alias("type"),
                F.unix_timestamp("op_ts").alias("ts"),
                F.col("lsn").alias("xid"),
                F.concat(F.lit("mysql-bin.000001:"), F.col("lsn")).alias("position"),
                F.struct("repo", "path", "commit", "lang", "content").alias("data"),
            )
        ).alias("value")
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--lake-root", required=True)
    parser.add_argument("--raw-path", default=None)
    parser.add_argument("--raw-format", choices=("parquet", "text"), default="parquet")
    parser.add_argument("--tables-config", default=None,
                        help="JSON file: {table: DDL schema}; default = "
                             "the canonical stream payload for every table")
    parser.add_argument("--events", type=int, default=1_000_000)
    parser.add_argument("--n-keys", type=int, default=0, help="default events/10")
    parser.add_argument("--n-tables", type=int, default=4)
    parser.add_argument("--batch-lsns", type=int, default=1_000_000)
    parser.add_argument("--n-buckets", type=int, default=64)
    parser.add_argument("--parallelism", type=int, default=2)
    parser.add_argument("--dlq-path", default=None)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--format", choices=("maxwell", "debezium"), default="maxwell",
                        dest="envelope_format",
                        help="wire format of the raw envelopes (picks the "
                             "router decoder; synthetic mode is maxwell-only)")
    parser.add_argument("--mode", choices=("batch", "streaming"), default="batch",
                        help="streaming = Structured Streaming tail of the "
                             "--raw-path drop zone (availableNow catch-up; "
                             "Spark's checkpoint + per-table batch ids carry "
                             "exactly-once across restarts)")
    parser.add_argument("--checkpoint", default=None,
                        help="checkpoint dir (required for --mode streaming)")
    args = parser.parse_args()
    if args.mode == "streaming" and not (args.raw_path and args.checkpoint):
        parser.error("--mode streaming requires --raw-path and --checkpoint")
    if args.envelope_format == "debezium" and not args.raw_path:
        parser.error("--format debezium requires --raw-path (the synthetic "
                     "generator emits Maxwell envelopes)")

    from pyspark.sql import SparkSession, functions as F
    from pyspark.sql import types as T

    spark = SparkSession.builder.appName("valentine-cdc-route").getOrCreate()

    from valentine_spark.cdc import LakeTable, replay_routed
    from valentine_spark.cdc.router import decode_debezium_routed, decode_maxwell_routed

    decoder = (
        decode_debezium_routed
        if args.envelope_format == "debezium"
        else decode_maxwell_routed
    )

    default_ddl = (
        "repo string, path string, commit string, lang string, content string"
    )
    if args.tables_config:
        with open(args.tables_config) as fh:
            schemas = {
                name: T.StructType.fromDDL(ddl)
                for name, ddl in json.load(fh).items()
            }
    else:
        schemas = {
            f"t{i}": T.StructType.fromDDL(default_ddl) for i in range(args.n_tables)
        }

    if args.raw_path:
        # text source already yields one "value" string column per line
        raw = (
            spark.read.text(args.raw_path)
            if args.raw_format == "text"
            else spark.read.parquet(args.raw_path)
        )
    else:
        raw = synth_envelopes(
            spark, args.events, args.n_keys or max(args.events // 10, 1),
            len(schemas), args.seed,
        )
    n_raw = raw.count()

    lakes = {
        name: LakeTable.open_or_create(
            f"{args.lake_root}/{name}", spark,
            schema=schema, n_buckets=args.n_buckets,
        )
        for name, schema in schemas.items()
    }

    if args.mode == "streaming":
        from valentine_spark.streaming import stream_route

        raw_stream = (
            spark.readStream.schema("value string").text(args.raw_path)
            if args.raw_format == "text"
            else spark.readStream.schema("value string").parquet(args.raw_path)
        )
        t0 = time.time()
        q = stream_route(
            raw_stream, lakes, schemas,
            checkpoint_dir=args.checkpoint,
            dlq_dir=args.dlq_path,
            available_now=True,
            parallelism=args.parallelism,
            decoder=decoder,
        )
        q.awaitTermination()
        wall = time.time() - t0
        slices = []
        if args.dlq_path:
            try:
                dlq_src = spark.read.parquet(args.dlq_path + "/*")
                dlq_counts = {
                    r["reason"]: r["n"]
                    for r in dlq_src.groupBy("reason")
                    .agg(F.count("*").alias("n")).collect()
                }
            except Exception:
                dlq_counts = {}  # no dead letters written -> no dirs to read
        else:
            dlq_counts = {}
    else:
        t0 = time.time()
        slices, routed = replay_routed(
            lakes, raw, schemas,
            batch_lsns=args.batch_lsns, parallelism=args.parallelism,
            decoder=decoder, return_routed=True,
        )
        wall = time.time() - t0

        # one quarantine pass: reuse the replay's own routed decode (no
        # second router plan over the raw stream), cache the small
        # dead-letter set so the write and the census share one scan
        dlq = routed.dead_letters.persist()
        try:
            dlq_counts = {
                r["reason"]: r["n"]
                for r in dlq.groupBy("reason").agg(F.count("*").alias("n")).collect()
            }
            if args.dlq_path:
                # deterministic subdir + overwrite: re-running the job after
                # a crash rewrites the same quarantine instead of appending
                # duplicate rows (mirrors stream_route's per-batch DLQ dirs)
                dlq.write.mode("overwrite").parquet(f"{args.dlq_path}/batch-bulk")
        finally:
            dlq.unpersist()

    tables_out = {}
    for name, lake in sorted(lakes.items()):
        state = lake.state_checksum()
        tables_out[name] = {
            "rows": state["rows"],
            "checksum": str(state["checksum"]),
            "version": lake.version,
        }
    applied = sum(
        0 if r.get("skipped") else 1 for s in slices for r in s.values()
    )
    skipped = sum(1 for s in slices for r in s.values() if r.get("skipped"))
    print(
        json.dumps(
            {
                "mode": args.mode,
                "tables": tables_out,
                "slices": len(slices),
                "commits": applied,
                "skipped": skipped,
                "wall_seconds": round(wall, 2),
                "events_total": n_raw,
                "events_per_sec": round(n_raw / wall, 1) if wall > 0 else None,
                "dead_letters": dlq_counts,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
