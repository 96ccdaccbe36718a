"""Structured Streaming tail tests: file drop-zone -> availableNow drain ->
state equals batch replay of the same events; checkpoint restart does not
double-apply."""

import os

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable, oracle_replay, replay, synth_change_stream
from valentine_spark.streaming import stream_apply, stream_from_files


@pytest.fixture(scope="module")
def drop_zone(spark, tmp_path_factory):
    """Write the synthetic stream as two parquet 'WAL segment' files."""
    root = tmp_path_factory.mktemp("dropzone")
    stream = synth_change_stream(spark, 3000, 400, seed=11)
    stream.where(F.col("lsn") < 1500).coalesce(1).write.parquet(str(root / "seg0"))
    stream.where(F.col("lsn") >= 1500).coalesce(1).write.parquet(str(root / "seg1"))
    # flatten into one drop dir
    drop = tmp_path_factory.mktemp("drop_flat")
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(str(root / "seg*" / "*.parquet")))):
        shutil.copy(f, str(drop / f"events_{i}.parquet"))
    return str(drop), stream


def test_stream_apply_available_now(spark, tmp_path, drop_zone):
    drop_dir, stream = drop_zone
    lake = LakeTable.create(str(tmp_path / "stream_lake"), spark, n_buckets=8)
    q = stream_apply(
        stream_from_files(spark, drop_dir),
        lake,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)

    batch_lake = LakeTable.create(str(tmp_path / "batch_lake"), spark, n_buckets=8)
    replay(batch_lake, stream, batch_lsns=1000)
    assert lake.state_checksum() == batch_lake.state_checksum()

    # restart over the same checkpoint: nothing new -> no new commits
    v = lake.version
    q2 = stream_apply(
        stream_from_files(spark, drop_dir),
        lake,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q2.awaitTermination(120)
    assert lake.version == v
