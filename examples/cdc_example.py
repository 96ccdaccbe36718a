"""CDC engine walkthrough: replay a synthetic change stream exactly-once,
kill/resume, auto-map a drifted batch, then consume the table's own
changelog downstream (follower mirror + readStream source)."""

import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import LakeTable, apply_batch, replay, resume_replay, synth_change_stream

spark = SparkSession.builder.master("local[4]").appName("cdc-example").getOrCreate()
root = tempfile.mkdtemp(prefix="cdc_example_")

lake = LakeTable.create(f"{root}/repo_files", spark, n_buckets=16)
stream = synth_change_stream(spark, 50_000, 5_000)

print("replay:", [c["version"] for c in replay(lake, stream.where(F.col("lsn") < 30_000), batch_lsns=10_000)])
print("state:", lake.state_checksum())

# crash recovery: resume picks up only unapplied lsn ranges
print("resume:", [c.get("version") for c in resume_replay(lake, stream, batch_lsns=10_000, batch_id_prefix="resume")])

# schema drift: renamed + added columns auto-mapped by the matcher cascade
drifted = (
    synth_change_stream(spark, 10_000, 5_000, start_lsn=50_000)
    .withColumnRenamed("content", "source_text")
    .withColumn("n_lines", F.length("source_text"))
)
commit = apply_batch(lake, drifted, "drifted-batch")
print("drift mapping:", commit.get("drift_mapping"))
print("schema:", [f.name for f in lake.schema.fields])

# downstream, half 1 — exactly-once mirror via the changelog follower:
# poll -> token-keyed MERGE -> checkpoint commit; safe to re-run anytime
from valentine_spark.cdc import mirror_changes

mirror = LakeTable.create(f"{root}/mirror", spark, n_buckets=16)
mirror_changes(lake, mirror, f"{root}/follower_ckpt")
assert mirror.state_checksum() == lake.state_checksum()
print("mirror matches source:", mirror.state_checksum()["rows"], "rows")

# downstream, half 2 — the same changelog as a Structured Streaming source
from valentine_spark.streaming import register_lake_changes

register_lake_changes(spark)
q = (
    spark.readStream.format("lake_changes")
    .option("startingVersion", "earliest")
    .load(lake.root)
    .writeStream.foreachBatch(
        lambda df, bid: print(f"micro-batch {bid}: {df.count()} change rows")
    )
    .option("checkpointLocation", f"{root}/stream_ckpt")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(120)

# downstream, half 3 — the fully declarative mirror: the same changelog
# source piped into the native exactly-once `lake` streaming sink.  Spark's
# checkpoint carries the offset; the sink's applied-batch-id manifest makes
# replays no-ops.  Zero driver loop code; `maxVersionsPerBatch` bounds each
# steady-state micro-batch.
from valentine_spark.sources.lake_batch import register_lake
from valentine_spark.streaming.lake_sink import prepare_lake_sink

register_lake(spark)
mirror2 = LakeTable.create(f"{root}/mirror2", spark, n_buckets=16)
q2 = (
    prepare_lake_sink(
        spark.readStream.format("lake_changes")
        .option("maxVersionsPerBatch", "4")
        .load(lake.root),
        mirror2.root,
    )
    .writeStream.format("lake")
    .option("path", mirror2.root)
    .option("checkpointLocation", f"{root}/sink_ckpt")
    .trigger(availableNow=True)
    .start()
)
q2.awaitTermination(300)
assert mirror2.state_checksum() == lake.state_checksum()
print("declarative mirror matches source:", mirror2.state_checksum()["rows"], "rows")
