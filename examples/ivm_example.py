"""Incremental view maintenance walkthrough: keep a per-language
materialized aggregate (count, sum, min, max) current from the lake's own
changelog — cost scales with churn, never table size (BENCH/BASELINE.md
§2j) — driven by the exactly-once changelog follower."""

import tempfile

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import (
    ChangelogFollower,
    LakeTable,
    apply_batch,
    init_aggregate,
    maintain_aggregate,
    replay,
    synth_change_stream,
)

spark = SparkSession.builder.master("local[4]").appName("ivm-example").getOrCreate()
root = tempfile.mkdtemp(prefix="ivm_example_")

lake = LakeTable.create(f"{root}/t", spark, n_buckets=8)
stream = synth_change_stream(spark, 40_000, 6_000)
replay(lake, stream.where(F.col("lsn") < 20_000), batch_lsns=20_000)


def prep(df):
    """Derived measure columns must exist on BOTH images: `clen` from the
    new image and `_before_clen` from the before image."""
    out = df.withColumn("clen", F.length(F.coalesce(F.col("content"), F.lit(""))))
    if "_before_content" in df.columns:
        out = out.withColumn(
            "_before_clen", F.length(F.coalesce(F.col("_before_content"), F.lit("")))
        )
    return out


measures = {
    "files": ("count", None),       # count(*)
    "bytes": ("sum", "clen"),       # delta-maintained, exact for integers
    "min_len": ("min", "clen"),     # selective group rescan (needs base=)
    "max_len": ("max", "clen"),
}

# bootstrap once from the full table; thereafter only changelogs are read
view = init_aggregate(prep(lake.read()), ["lang"], measures).cache()
view.count()
print("bootstrap:")
view.orderBy("lang").show()

# roll the view forward from the changelog, exactly-once via the follower:
# poll -> maintain -> commit; a crash replays the same delivery verbatim
follower = ChangelogFollower(lake, f"{root}/ckpt", start="latest",
                             include_before=True)
for i, lo in enumerate((20_000, 30_000)):
    batch = stream.where((F.col("lsn") >= lo) & (F.col("lsn") < lo + 10_000))
    apply_batch(lake, batch, f"tail-{i}")
    d = follower.poll()
    chg = prep(d.df).persist()  # min/max maintenance reads the diff 3x
    view = maintain_aggregate(
        view, chg, ["lang"], measures, base=prep(lake.read())
    ).cache()
    view.count()
    chg.unpersist()
    follower.commit(d)
    print(f"after window {d.token}:")
    view.orderBy("lang").show()

# the maintained view equals a from-scratch recompute — the IVM invariant
fresh = init_aggregate(prep(lake.read()), ["lang"], measures)
assert sorted(map(tuple, view.collect())) == sorted(map(tuple, fresh.collect()))
print("maintained view == from-scratch recompute")
