"""Incremental near-dup maintenance walkthrough: keep a MinHash-LSH
candidate-pair view of a source-code lake current from its own changelog —
per-poll cost scales with the delivery, never the corpus — wired through
the exactly-once changelog follower (delivery token = index MERGE batch_id,
so a crash-replayed poll is a no-op on the index)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from valentine_spark.cdc import (
    ChangelogFollower,
    LakeTable,
    MinHashLshIndex,
    replay,
    synth_change_stream,
)

spark = SparkSession.builder.master("local[4]").appName("ilsh-example").getOrCreate()
root = tempfile.mkdtemp(prefix="ilsh_example_")

# the source lake ingests a change stream in two waves
lake = LakeTable.create(f"{root}/src", spark, n_buckets=8)
stream = synth_change_stream(spark, 30_000, 4_000)
replay(lake, stream.where(F.col("lsn") < 15_000), batch_lsns=15_000)

# index + follower; one poll per source commit window
idx = MinHashLshIndex.create(f"{root}/idx", spark, n=8, k=8, bands=4, n_buckets=8)
fol = ChangelogFollower(lake, f"{root}/ckpt", consumer_id="lsh")

pair_count = 0
while (d := fol.poll()) is not None:
    v0 = idx.version
    idx.update(d.df, batch_id=d.token)          # exactly-once on the token
    delta = idx.pair_delta(v0)                  # pure fn of (v0, head)
    by_op = {r["pair_op"]: r["count"] for r in delta.groupBy("pair_op").count().collect()}
    pair_count += by_op.get("added", 0) - by_op.get("removed", 0)
    fol.commit(d)
    print(f"window -> v{idx.version}: +{by_op.get('added', 0)} "
          f"-{by_op.get('removed', 0)} (net {pair_count})")

# second ingest wave, then catch up the index the same way
replay(lake, stream.where(F.col("lsn") >= 15_000), batch_lsns=15_000,
       batch_id_prefix="w2")
while (d := fol.poll()) is not None:
    v0 = idx.version
    idx.update(d.df, batch_id=d.token)
    delta = idx.pair_delta(v0)
    by_op = {r["pair_op"]: r["count"] for r in delta.groupBy("pair_op").count().collect()}
    pair_count += by_op.get("added", 0) - by_op.get("removed", 0)
    fol.commit(d)

full = idx.pairs().count()
print(f"folded pair count {pair_count} == full index view {full}: "
      f"{pair_count == full}")
assert pair_count == full
spark.stop()
