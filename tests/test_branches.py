"""Branches / write-audit-publish (cdc/lake.py branch refs — the Iceberg
branch + fast-forward / WAP analogue).

Invariants:
  * a branch fork is O(1) metadata (zero data copied); branch commits are
    INVISIBLE on main until fast_forward;
  * fast_forward publishes the exact branch state (== a straight replay)
    and carries the exactly-once applied set;
  * publish is true fast-forward only: a diverged target or a foreign
    fork refuses;
  * expiry from ANY ref handle never deletes a file another live ref's
    head references; delete_branch + expiry reclaims branch-only files;
  * stacked branches publish to their parent.
"""

import os

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import (
    CommitConflictError,
    LakeTable,
    apply_batch,
    synth_change_stream,
)


def _state(lake):
    return sorted(map(tuple, lake.read().drop("_bucket").collect()))


def _mk(spark, path):
    lake = LakeTable.create(str(path), spark, n_buckets=4, target_file_rows=200)
    stream = synth_change_stream(spark, 3000, 2000, seed=7)
    apply_batch(lake, stream.where(F.col("lsn") < 1500), "b1")
    return lake, stream


def test_wap_publish_equals_straight_replay(spark, tmp_path):
    lake, stream = _mk(spark, tmp_path / "t")
    v_main, rows_main = lake.version, lake.read().count()
    wap = lake.create_branch("wap-1")
    apply_batch(wap, stream.where(F.col("lsn") >= 1500), "b2")
    # audit phase: main is untouched
    assert lake.version == v_main and lake.read().count() == rows_main
    assert not lake.is_applied("b2")
    res = lake.fast_forward("wap-1")
    assert res["published_commits"] == 1
    oracle = LakeTable.create(str(tmp_path / "o"), spark, n_buckets=4,
                              target_file_rows=200)
    apply_batch(oracle, stream, "all")
    assert _state(lake) == _state(oracle)
    # the branch's exactly-once history published with it
    assert lake.is_applied("b2")
    assert apply_batch(lake, stream.where(F.col("lsn") >= 1500), "b2")["skipped"]
    lake.delete_branch("wap-1")
    assert lake.list_branches() == []


def test_fast_forward_refuses_divergence_and_foreign_fork(spark, tmp_path):
    lake, stream = _mk(spark, tmp_path / "t")
    wap = lake.create_branch("wap-2")
    apply_batch(wap, stream.where(F.col("lsn") >= 1500), "b2")
    apply_batch(lake, synth_change_stream(spark, 100, 2000, seed=1), "b3")
    with pytest.raises(CommitConflictError):
        lake.fast_forward("wap-2")  # main advanced past the fork
    # a branch forked from a BRANCH publishes to its parent, not to main
    nested = wap.create_branch("wap-2-fix")
    apply_batch(nested, synth_change_stream(spark, 50, 2000, seed=5), "b5")
    with pytest.raises(CommitConflictError):
        lake.fast_forward("wap-2-fix")
    res = wap.fast_forward("wap-2-fix")
    assert res["published_commits"] == 1
    assert _state(wap) == _state(nested)


def test_expiry_from_any_ref_preserves_other_refs(spark, tmp_path):
    lake, stream = _mk(spark, tmp_path / "t")
    wap = lake.create_branch("audit")
    apply_batch(wap, stream.where(F.col("lsn") >= 1500), "b2")
    branch_state = _state(wap)
    # main-handle expiry must keep the branch head's files
    apply_batch(lake, synth_change_stream(spark, 200, 2000, seed=2), "b3")
    lake.expire_snapshots(keep_last=1)
    assert _state(wap) == branch_state
    # branch-handle expiry must keep main readable (head + snapshot json)
    main_state = _state(lake)
    wap.expire_snapshots(keep_last=1)
    assert _state(lake) == main_state
    assert _state(wap) == branch_state


def test_delete_branch_then_expire_reclaims_branch_files(spark, tmp_path):
    lake, stream = _mk(spark, tmp_path / "t")
    wap = lake.create_branch("tmp")
    apply_batch(wap, stream.where(F.col("lsn") >= 1500), "b2")
    branch_files = {
        e["path"] for es in wap._bucket_files(wap.metadata()).values() for e in es
    }
    main_files = {
        e["path"] for es in lake._bucket_files(lake.metadata()).values() for e in es
    }
    only_branch = branch_files - main_files
    assert only_branch
    lake.delete_branch("tmp")
    got = lake.expire_snapshots(keep_last=1)
    assert got["removed_files"] >= len(only_branch)
    for rel in only_branch:
        assert not os.path.exists(os.path.join(lake.root, rel))
    assert _state(lake)  # main intact


def test_branch_time_travel_and_name_validation(spark, tmp_path):
    lake, stream = _mk(spark, tmp_path / "t")
    wap = lake.create_branch("tt")
    v_fork = wap.version
    apply_batch(wap, stream.where(F.col("lsn") >= 1500), "b2")
    assert _state(LakeTable(lake.root, spark, ref="tt")) == _state(wap)
    old = wap.read(version=v_fork)
    assert sorted(map(tuple, old.drop("_bucket").collect())) == _state(lake)
    with pytest.raises(ValueError):
        lake.create_branch("main")
    with pytest.raises(ValueError):
        lake.create_branch("../evil")
    with pytest.raises(FileExistsError):
        lake.create_branch("tt")
    with pytest.raises(FileNotFoundError):
        lake.branch("nope")
