"""WAL/binlog envelope decoders (cdc/wal.py): Debezium + Maxwell JSON →
canonical change stream, with dead-letter quarantine.

Covers: op mapping (c/r/u/d, insert/update/delete/bootstrap-insert), row
image selection (after vs before vs data), timestamp units (ms vs s),
binlog-position LSN packing, escaping/unicode round-trip via to_json, every
quarantine reason, and end-to-end: decoded stream → apply_batch → lake
state equals applying the clean source rows directly.
"""

import json

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from valentine_spark.cdc import LakeTable, apply_batch
from valentine_spark.cdc.wal import (
    decode_debezium,
    decode_maxwell,
    maxwell_position_lsn,
)

PAYLOAD = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
)


def _img(i, content="body"):
    return {
        "repo": f"org/r{i % 3}",
        "path": f"src/f{i}.py",
        "commit": "head",
        "lang": "python",
        "content": content,
    }


def _dbz(i, op="u", content="body", ts_ms=None, lsn=None, drop=()):
    env = {
        "before": _img(i, content) if op == "d" else None,
        "after": None if op == "d" else _img(i, content),
        "op": op,
        "ts_ms": 1_700_000_000_000 + i if ts_ms is None else ts_ms,
        "source": {"lsn": (i + 1) if lsn is None else lsn},
    }
    for k in drop:
        env.pop(k, None)
    return json.dumps(env)


def _raw(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["value"])


def test_debezium_ops_images_and_units(spark):
    rows = [_dbz(0, "c"), _dbz(1, "r"), _dbz(2, "u"), _dbz(3, "d")]
    out = decode_debezium(_raw(spark, rows), PAYLOAD)
    got = {r["lsn"]: r for r in out.stream.collect()}
    assert out.dead_letters.count() == 0
    assert [got[i + 1]["op"] for i in range(4)] == ["upsert", "upsert", "upsert", "delete"]
    # delete image comes from `before`
    assert got[4]["path"] == "src/f3.py" and got[4]["content"] == "body"
    # ts_ms is milliseconds
    assert got[1]["op_ts"].microsecond == 0
    assert int(got[1]["op_ts"].timestamp() * 1000) == 1_700_000_000_000


def test_debezium_escaping_unicode_roundtrip(spark):
    nasty = 'a"b\\c\nd\té中 {"k": [1,2]}'
    out = decode_debezium(_raw(spark, [_dbz(0, "c", content=nasty)]), PAYLOAD)
    assert out.stream.collect()[0]["content"] == nasty


def test_debezium_quarantine_cascade(spark):
    cases = [
        ('{"befo', "unparseable"),
        (None, "unparseable"),
        ("[1,2,3]", "unparseable"),
        (_dbz(0, drop=("op",)), "missing_op"),
        (_dbz(1, op="z"), "unknown_op"),
        (_dbz(2, lsn=None, drop=("source",)), "missing_lsn"),
        (_dbz(3, ts_ms=0, drop=("ts_ms",)), "missing_ts"),
        (json.dumps({"op": "u", "ts_ms": 5, "source": {"lsn": 9}}), "missing_image"),
    ]
    # missing key col inside the image
    img = _img(7)
    img["path"] = None
    cases.append(
        (
            json.dumps({"after": img, "op": "c", "ts_ms": 5, "source": {"lsn": 9}}),
            "missing_key",
        )
    )
    out = decode_debezium(_raw(spark, [c for c, _ in cases]), PAYLOAD)
    assert out.stream.count() == 0
    got = [r["reason"] for r in out.dead_letters.collect()]
    assert sorted(got) == sorted(r for _, r in cases)
    # raw text is preserved for replay/debugging
    raws = {r["raw"] for r in out.dead_letters.collect()}
    assert '{"befo' in raws and None in raws


def test_truncated_record_with_salvageable_prefix_is_unparseable(spark):
    """Spark's JSON partial-results mode (default on) can salvage the
    prefix fields of a truncated record — op/ts_ms parse fine, only the
    tail is gone.  The decoder must still quarantine it as "unparseable"
    (the parser's corrupt-record flag), NOT as missing_lsn, and never let
    the salvaged prefix leak into the stream: classification by
    are-fields-null is plan-dependent under per-field schema pruning."""
    full = _dbz(0, "u")
    for cut in range(1, 8):
        out = decode_debezium(_raw(spark, [full[:-cut]]), PAYLOAD)
        assert out.stream.count() == 0
        assert out.dead_letters.collect()[0]["reason"] == "unparseable", cut


def test_debezium_first_match_precedence(spark):
    # unknown op AND missing lsn: op check fires first
    bad = json.dumps({"after": _img(0), "op": "z", "ts_ms": 5, "source": {}})
    out = decode_debezium(_raw(spark, [bad]), PAYLOAD)
    assert out.dead_letters.collect()[0]["reason"] == "unknown_op"


def test_debezium_to_json_roundtrip_property(spark):
    """Envelope built by Spark's own to_json must decode losslessly."""
    n = 500
    base = spark.range(n).select(
        F.col("id"),
        F.struct(
            F.concat(F.lit("org/r"), F.pmod("id", F.lit(7))).alias("repo"),
            F.concat(F.lit("p"), F.col("id")).alias("path"),
            F.lit("head").alias("commit"),
            F.lit("go").alias("lang"),
            F.concat(F.lit('x="'), F.hex(F.xxhash64("id")), F.lit('"\n')).alias("content"),
        ).alias("img"),
    )
    env = base.select(
        F.to_json(
            F.struct(
                F.when(F.pmod("id", F.lit(5)) == 4, F.col("img")).alias("before"),
                F.when(F.pmod("id", F.lit(5)) != 4, F.col("img")).alias("after"),
                F.when(F.pmod("id", F.lit(5)) == 4, F.lit("d"))
                .otherwise(F.lit("u"))
                .alias("op"),
                (F.lit(1_700_000_000_000) + F.col("id")).alias("ts_ms"),
                F.struct((F.col("id") + 1).alias("lsn")).alias("source"),
            )
        ).alias("value")
    )
    out = decode_debezium(env, PAYLOAD)
    assert out.dead_letters.count() == 0
    decoded = out.stream
    assert decoded.count() == n
    # bit-exact payload round-trip
    want = base.select(
        (F.col("id") + 1).alias("lsn"),
        F.col("img.repo").alias("repo"),
        F.col("img.path").alias("path"),
        F.col("img.content").alias("content"),
    )
    gotc = decoded.select("lsn", "repo", "path", "content")
    assert gotc.exceptAll(want).count() == 0 and want.exceptAll(gotc).count() == 0
    assert decoded.where(F.col("op") == "delete").count() == n // 5


def test_maxwell_position_lsn_total_order(spark):
    df = spark.createDataFrame(
        [
            ("mysql-bin.000007:12345",),
            ("mysql-bin.000007:99999",),
            ("mysql-bin.000008:5",),
            ("garbage",),
            (None,),
        ],
        ["position"],
    )
    got = [r[0] for r in df.select(maxwell_position_lsn(F.col("position"))).collect()]
    assert got[0] == 7 * (1 << 40) + 12345
    assert got[0] < got[1] < got[2]
    assert got[3] is None and got[4] is None


def _mxw(i, typ="update", position=None, drop=()):
    env = {
        "database": "gh",
        "table": "files",
        "type": typ,
        "ts": 1_700_000_000 + i,
        "xid": 55 + i,
        "position": position or f"mysql-bin.000003:{1000 + i}",
        "data": _img(i),
        "old": None,
    }
    for k in drop:
        env.pop(k, None)
    return json.dumps(env)


def test_maxwell_decode_and_quarantine(spark):
    rows = [
        _mxw(0, "insert"),
        _mxw(1, "update"),
        _mxw(2, "delete"),
        _mxw(3, "bootstrap-insert"),
        _mxw(4, "truncate"),              # unknown op
        _mxw(5, position="not-a-pos"),    # missing_lsn
        _mxw(6, drop=("ts",)),            # missing_ts
        "{oops",                           # unparseable
    ]
    out = decode_maxwell(_raw(spark, rows), PAYLOAD)
    stream = {r["path"]: r for r in out.stream.collect()}
    assert len(stream) == 4
    assert stream["src/f2.py"]["op"] == "delete"
    # Maxwell deletes carry the row in `data`
    assert stream["src/f2.py"]["content"] == "body"
    assert stream["src/f0.py"]["op"] == "upsert"
    # ts is SECONDS
    assert int(stream["src/f1.py"]["op_ts"].timestamp()) == 1_700_000_001
    assert stream["src/f3.py"]["lsn"] == 3 * (1 << 40) + 1003
    reasons = sorted(r["reason"] for r in out.dead_letters.collect())
    assert reasons == ["missing_lsn", "missing_ts", "unknown_op", "unparseable"]


def test_decoded_stream_drives_apply_batch(spark, tmp_path):
    """End-to-end: envelopes → decode → apply_batch produces the same lake
    state as applying the equivalent clean rows directly."""
    envs, clean = [], []
    for i in range(60):
        op = "d" if i % 10 == 9 else "u"
        envs.append(_dbz(i % 20, op=op, content=f"v{i}", ts_ms=10_000 + i, lsn=i + 1))
        img = _img(i % 20, f"v{i}")
        clean.append(Row(lsn=i + 1, op="delete" if op == "d" else "upsert", **img))
    decoded = decode_debezium(_raw(spark, envs), PAYLOAD)
    assert decoded.dead_letters.count() == 0

    lake_a = LakeTable.create(str(tmp_path / "a"), spark, n_buckets=4)
    apply_batch(lake_a, decoded.stream, "b1")

    clean_df = spark.createDataFrame(clean).withColumn(
        "op_ts", F.timestamp_millis(F.lit(10_000) + F.col("lsn") - 1)
    ).select("lsn", "op_ts", "op", "repo", "path", "commit", "lang", "content")
    lake_b = LakeTable.create(str(tmp_path / "b"), spark, n_buckets=4)
    apply_batch(lake_b, clean_df, "b1")

    assert lake_a.state_checksum() == lake_b.state_checksum()
