"""CDC engine walkthrough: replay a synthetic change stream exactly-once,
kill/resume, and auto-map a drifted batch."""

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
