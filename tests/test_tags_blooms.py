"""Tags (immutable named snapshots, Iceberg tag analogue) and
bloom_cols (parquet row-group bloom filters for high-cardinality
equality predicates)."""

import os

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable, apply_batch, synth_change_stream


def _mk(spark, path, **kw):
    lake = LakeTable.create(str(path), spark, n_buckets=4, target_file_rows=500, **kw)
    stream = synth_change_stream(spark, 3000, 2000, seed=7)
    apply_batch(lake, stream.where(F.col("lsn") < 1500), "b1")
    apply_batch(lake, stream.where(F.col("lsn") >= 1500), "b2")
    return lake


def _state(lake, version=None):
    return sorted(map(tuple, lake.read(version=version).drop("_bucket").collect()))


def test_tag_pins_snapshot_through_expiry(spark, tmp_path):
    lake = _mk(spark, tmp_path / "t")
    v_mid = lake.version - 1
    mid_state = _state(lake, version=v_mid)
    lake.create_tag("training-v1", version=v_mid)
    apply_batch(lake, synth_change_stream(spark, 500, 2000, seed=9), "b3")
    lake.expire_snapshots(keep_last=1)
    # the tagged snapshot and its files survive; untagged history is gone
    assert _state(lake, version=lake.tag_version("training-v1")) == mid_state
    with pytest.raises(FileNotFoundError):
        lake.metadata(0)
    # deleting the tag releases it for the next expiry
    lake.delete_tag("training-v1")
    lake.expire_snapshots(keep_last=1)
    assert not os.path.exists(lake._meta_path(v_mid))


def test_tag_immutability_and_listing(spark, tmp_path):
    lake = _mk(spark, tmp_path / "t")
    lake.create_tag("cut", version=1)
    with pytest.raises(FileExistsError):
        lake.create_tag("cut", version=2)
    assert [t["name"] for t in lake.list_tags()] == ["cut"]
    with pytest.raises(FileNotFoundError):
        lake.create_tag("ghost", version=99)
    with pytest.raises(FileNotFoundError):
        lake.tag_version("nope")


def test_bloom_cols_write_through_and_equality(spark, tmp_path):
    lake = _mk(spark, tmp_path / "b", bloom_cols=["content"])
    plain = _mk(spark, tmp_path / "p")

    def total_bytes(t):
        return sum(
            e["bytes"] for es in t._bucket_files(t.metadata()).values() for e in es
        )

    # blooms add bytes (proof the writer option took effect) but stay
    # small under NDV sizing; state and equality reads are unchanged
    delta = total_bytes(lake) - total_bytes(plain)
    assert 0 < delta < 0.10 * total_bytes(plain)
    assert _state(lake) == _state(plain)
    probe = _state(lake)[0]
    assert lake.read().where(F.col("content") == probe[4]).count() >= 1
    assert lake.read().where(F.col("content") == "no-such-value").count() == 0
    # bloom_cols follow a rename and survive merges after it
    lake.rename_column("content", "body")
    assert lake.metadata()["bloom_cols"] == ["body"]
    apply_batch(
        lake,
        synth_change_stream(spark, 200, 2000, seed=5).withColumnRenamed(
            "content", "body"
        ),
        "b3",
    )
    assert lake.read().where(F.col("body") == probe[4]).count() >= 1


def test_bloom_cols_rejects_unknown_column(spark, tmp_path):
    with pytest.raises(KeyError):
        LakeTable.create(str(tmp_path / "x"), spark, bloom_cols=["nope"])


def test_cross_ref_tag_survives_other_ref_expiry(spark, tmp_path):
    """Data files are shared across refs, so a tag on a BRANCH must pin its
    files through a MAIN-handle expiry (and vice versa).  Pre-fix, only
    tags on the expiring handle's own ref were honored and the tagged
    branch snapshot lost its parquet files."""
    lake = _mk(spark, tmp_path / "x")
    wap = lake.create_branch("audit")
    apply_batch(wap, synth_change_stream(spark, 800, 2000, seed=9), "b3")
    v_tagged = wap.version
    tagged_state = _state(wap, version=v_tagged)
    wap.create_tag("cut")
    # branch head moves past the tag; its old files are tag-pinned only
    apply_batch(wap, synth_change_stream(spark, 800, 2000, seed=11), "b4")
    wap.compact(min_files=1)
    # main moves on and expires aggressively
    apply_batch(lake, synth_change_stream(spark, 400, 2000, seed=12), "b5")
    lake.expire_snapshots(keep_last=1)
    assert _state(wap, version=wap.tag_version("cut")) == tagged_state
    # symmetric: a main tag survives a branch-handle expiry
    v_main = lake.version
    main_state = _state(lake, version=v_main)
    lake.create_tag("main-cut")
    apply_batch(lake, synth_change_stream(spark, 400, 2000, seed=13), "b6")
    lake.compact(min_files=1)
    wap.expire_snapshots(keep_last=1)
    assert _state(lake, version=lake.tag_version("main-cut")) == main_state
