"""Row-level predicate mutations: LakeTable.delete_where / update_where
(the DELETE FROM … WHERE / UPDATE … SET … WHERE lake ops — GDPR erasure,
retention, backfill correction).

Invariants:
  * result equality with the from-scratch relational semantics in every
    state (clean / dirty MoR / sort-compacted / after stats pruning);
  * cost = only files that CAN match are rewritten (bounds-excluded files
    keep their paths in the manifest, byte-identical);
  * SQL NULL semantics: a NULL predicate never deletes/updates a row;
  * exactly-once under batch_id (duplicate op skips);
  * key columns are not updatable; history records the op.
"""

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable, apply_batch, synth_change_stream


def _mk(spark, path, **kw):
    lake = LakeTable.create(str(path), spark, n_buckets=4,
                            target_file_rows=200, stats_cols=["lang"], **kw)
    stream = synth_change_stream(spark, 6000, 4000, seed=23)
    apply_batch(lake, stream.where(F.col("lsn") < 3000), "b1")
    apply_batch(lake, stream.where(F.col("lsn") >= 3000), "b2")
    return lake


def _state(lake):
    return sorted(map(tuple, lake.read().drop("_bucket").collect()))


def test_delete_where_equals_relational_filter(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d1")
    before = _state(lake)
    want = [t for t in before if t[3] != "rust"]
    n_rust = len(before) - len(want)
    assert n_rust > 0
    out = lake.delete_where([("lang", "=", "rust")])
    assert out["rows_matched"] == n_rust
    assert _state(lake) == want
    # idempotent re-run matches nothing
    assert lake.delete_where([("lang", "=", "rust")])["rows_matched"] == 0
    # history records the op
    assert lake.history().collect()[0]["kind"] == "delete"


def test_delete_where_prunes_untouched_files(spark, tmp_path):
    lake = _mk(spark, tmp_path / "d2")
    lake.compact(min_files=1, sort_cols=["lang"])  # tight bounds
    files_before = {
        e["path"]
        for es in lake._bucket_files(lake.metadata()).values()
        for e in es
    }
    pv = lake.prune_preview([("lang", "=", "go")])
    assert 0 < pv["kept_files"] < pv["total_files"]
    out = lake.delete_where([("lang", "=", "go")])
    assert out["files_rewritten"] == pv["kept_files"]
    files_after = {
        e["path"]
        for es in lake._bucket_files(lake.metadata()).values()
        for e in es
    }
    # bounds-excluded files survive the commit with their original paths
    carried = files_before & files_after
    assert len(carried) == pv["total_files"] - pv["kept_files"]
    assert lake.read().where(F.col("lang") == "go").count() == 0


def test_update_where_literal_and_expression(spark, tmp_path):
    lake = _mk(spark, tmp_path / "u1")
    before = _state(lake)
    out = lake.update_where(
        [("lang", "=", "go")],
        {"lang": "golang", "content": F.concat(F.lit("v2:"), F.col("content"))},
    )
    assert out["rows_matched"] > 0
    got = _state(lake)
    want = sorted(
        (r, p, c, "golang", "v2:" + (body or "")) if lang == "go"
        else (r, p, c, lang, body)
        for r, p, c, lang, body in before
    )
    assert got == want
    assert lake.history().collect()[0]["kind"] == "update"
    # stats bounds refreshed: the old value no longer matches anything
    assert lake.scan([("lang", "=", "go")]).count() == 0
    assert lake.scan([("lang", "=", "golang")]).count() == out["rows_matched"]


def test_update_where_rejects_key_columns_and_unknown(spark, tmp_path):
    lake = _mk(spark, tmp_path / "u2")
    with pytest.raises(ValueError):
        lake.update_where([("lang", "=", "go")], {"path": "x"})
    with pytest.raises(KeyError):
        lake.update_where([("lang", "=", "go")], {"nope": "x"})
    with pytest.raises(ValueError):
        lake.update_where([("lang", "=", "go")], {})


def test_null_predicate_rows_are_never_mutated(spark, tmp_path):
    lake = LakeTable.create(str(tmp_path / "n1"), spark, n_buckets=2,
                            target_file_rows=500, stats_cols=["lang"])
    rows = spark.range(100).select(
        F.concat(F.lit("org/r"), F.pmod("id", F.lit(3))).alias("repo"),
        F.concat(F.lit("p"), F.col("id")).alias("path"),
        F.lit("head").alias("commit"),
        F.when(F.pmod("id", F.lit(4)) == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("go")).alias("lang"),
        F.lit("body").alias("content"),
    )
    lake.merge(rows, rows.limit(0).select("repo", "path", "commit"), "b1")
    n_null = lake.read().where(F.col("lang").isNull()).count()
    assert n_null == 25
    out = lake.delete_where([("lang", "=", "go")])
    assert out["rows_matched"] == 75
    # every NULL-lang row survived
    assert lake.read().count() == n_null
    assert lake.read().where(F.col("lang").isNull()).count() == n_null


def test_mutations_on_dirty_mor_state(spark, tmp_path):
    """Predicate mutations over unresolved multi-version state must apply
    to the RESOLVED winners only (old superseded versions can't leak), and
    the touched buckets come out clean."""
    lake = _mk(spark, tmp_path / "m1", write_mode="mor")
    assert lake.metadata().get("dirty"), "fixture must be dirty"
    before = _state(lake)
    want = [t for t in before if t[3] != "python"]
    out = lake.delete_where([("lang", "=", "python")])
    assert out["rows_matched"] == len(before) - len(want)
    assert _state(lake) == want
    assert not lake.metadata().get("dirty")


def test_exactly_once_batch_id(spark, tmp_path):
    lake = _mk(spark, tmp_path / "e1")
    n = lake.read().count()
    out1 = lake.delete_where([("lang", "=", "scala")], batch_id="gdpr-42")
    assert out1["rows_matched"] > 0 and not out1.get("skipped")
    out2 = lake.delete_where([("lang", "=", "scala")], batch_id="gdpr-42")
    assert out2["skipped"]
    assert lake.read().count() == n - out1["rows_matched"]
    # a no-op mutation with a batch id still lands exactly-once
    out3 = lake.delete_where([("lang", "=", "zzz")], batch_id="gdpr-43")
    assert out3["rows_matched"] == 0 and not out3.get("skipped")
    assert lake.delete_where([("lang", "=", "zzz")], batch_id="gdpr-43")["skipped"]


def test_delete_everything_then_time_travel(spark, tmp_path):
    lake = _mk(spark, tmp_path / "t1")
    v = lake.version
    n = lake.read().count()
    lake.delete_where([("lang", ">", "")])  # every non-null lang
    assert lake.read().count() == lake.read(version=lake.version).count() == 0
    # old snapshot unaffected
    assert lake.read(version=v).count() == n
    # restore undoes the erasure
    lake.restore(v)
    assert lake.read().count() == n
