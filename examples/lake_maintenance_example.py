"""Lake table-maintenance walkthrough (the round-4 surface): conditional
MERGE INTO, GDPR-style predicate mutations, rename/drop schema evolution
without rewrite, type widening, column defaults, alter-properties,
branches + write-audit-publish, tags, Z-order clustering with data
skipping, orphan-file GC, and the metadata tables.

Run: python examples/lake_maintenance_example.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import LakeTable, apply_batch, synth_change_stream

spark = (
    SparkSession.builder.master("local[4]")
    .appName("lake-maintenance-example")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
root = tempfile.mkdtemp(prefix="lake_tour_")

lake = LakeTable.create(
    f"{root}/t", spark, n_buckets=8, target_file_rows=500,
    stats_cols=["lang"], bloom_cols=["content"],
)
apply_batch(lake, synth_change_stream(spark, 20_000, 8_000), "load")
print("rows:", lake.read().count())

# -- conditional MERGE INTO (Delta-style builder) -------------------------
picked = lake.read().limit(500).select("repo", "path", "commit")
src = picked.select("*", F.lit("zig").alias("lang"), F.lit("patched").alias("content"))
res = (
    lake.merge_into(src)
    .when_matched_delete(condition=F.col("t.lang") == "rust")
    .when_matched_update({"content": F.col("s.content")})
    .when_not_matched_insert()
    .execute(batch_id="backfill-1")
)
print("merge_into:", {k: res[k] for k in ("rows_updated", "rows_deleted", "rows_inserted")})

# -- row-level predicate mutations (GDPR erasure / retention) --------------
print("redact:", lake.update_where([("lang", "=", "go")],
                                   {"content": F.lit("[redacted]")})["rows_matched"])
print("erase:", lake.delete_where([("lang", "=", "cpp")])["rows_matched"])

# -- rename without rewrite (field-id era mapping) -------------------------
lake.create_tag("before-rename")
lake.rename_column("lang", "language")
print("schema now:", [f.name for f in lake.schema.fields])
print("tagged snapshot still serves the old name:",
      "lang" in lake.read(version=lake.tag_version("before-rename")).columns)

# -- write-audit-publish ----------------------------------------------------
wap = lake.create_branch("wap-demo")
apply_batch(wap, synth_change_stream(spark, 5_000, 8_000, seed=9)
            .withColumnRenamed("lang", "language"), "audit-batch")
assert not lake.is_applied("audit-batch")  # main isolated during the audit
lake.fast_forward("wap-demo")
lake.delete_branch("wap-demo")
print("published; main version:", lake.version)

# -- Z-order clustering + data skipping ------------------------------------
lake.compact(min_files=1, sort_cols=["language", "content"], zorder=True)
pv = lake.prune_preview([("language", "=", "python")])
print(f"scan plans {pv['kept_files']}/{pv['total_files']} files for language = 'python'")

# -- type widening + column defaults (metadata-only schema evolution) -------
from pyspark.sql import types as T

lake.evolve_schema(
    [T.StructField("stars", T.IntegerType())], "popularity",
    defaults={"stars": 0},  # pre-add files read 0, not NULL
)
print("stars default on old rows:",
      lake.read().agg(F.min("stars"), F.max("stars")).collect()[0])
lake.widen_column("stars", T.LongType())  # int -> bigint, zero rewrite
print("widened:", lake.schema["stars"].dataType, "— lineage:",
      lake.lineage()[-1]["widen_column"])

# -- alter write properties --------------------------------------------------
lake.alter_properties(stats_cols=["language", "stars"], target_file_rows=1000)
print("props:", {k: lake.metadata()[k] for k in ("stats_cols", "target_file_rows")})

# -- orphan-file GC (keeps ALL snapshots, removes crash debris) --------------
print("orphans:", lake.remove_orphan_files(min_age_seconds=0)["removed_files"])

# -- metadata tables ---------------------------------------------------------
lake.partitions().show(4)
lake.snapshots().select("version", "kind", "batch_id", "is_current").show(8)

spark.stop()
