"""Streaming multi-table ingest (streaming/stream.py stream_route): a file
drop-zone of raw Maxwell JSON lines fans out to two lakes with different
payload schemas through foreachBatch, exactly-once per (micro-batch,
table) across checkpoint restarts, with the dead-letter quarantine
written exactly-once per micro-batch."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from valentine_spark.cdc import LakeTable
from valentine_spark.streaming import stream_route

FILES = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
)
REVIEWS = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("reviewer", StringType()),
        StructField("score", LongType()),
    ]
)
SCHEMAS = {"files": FILES, "reviews": REVIEWS}


def _envelope(table, offset, op, data):
    return json.dumps(
        {
            "database": "gh", "table": table, "type": op,
            "ts": 1_700_000_000 + offset, "xid": offset,
            "position": f"mysql-bin.000001:{offset}",
            "data": data, "old": None,
        }
    )


def _write_drop(drop_dir, name, lines, seq):
    """WAL shipping drops files in order: give each an increasing mtime —
    Spark's file source orders pending files by modification time, and
    equal mtimes would make micro-batch order (and therefore cross-batch
    LWW application order) arbitrary."""
    os.makedirs(drop_dir, exist_ok=True)
    tmp = os.path.join(drop_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    final = os.path.join(drop_dir, name)
    os.rename(tmp, final)
    t = 1_700_000_000 + seq * 10
    os.utime(final, (t, t))


def _lines(start, stop):
    out, model = [], {"files": {}, "reviews": {}}
    for i in range(start, stop):
        key = {"repo": f"r{i % 4}", "path": f"p{i % 15}", "commit": "head"}
        if i % 3 == 0:
            data = {**key, "reviewer": f"u{i % 5}", "score": i}
            out.append(_envelope("reviews", i + 1, "insert", data))
        else:
            data = {**key, "lang": "py", "content": f"c{i}"}
            out.append(_envelope("files", i + 1, "update", data))
    if start == 0:
        out.append('{"table": "files", "bad')  # unparseable dead letter
    return out


def _drain(spark, drop_dir, tables, tmp_path):
    raw = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", "1")
        .text(drop_dir)
    )
    q = stream_route(
        raw, tables, SCHEMAS,
        checkpoint_dir=str(tmp_path / "ckpt"),
        dlq_dir=str(tmp_path / "dlq"),
        available_now=True,
        parallelism=2,
    )
    q.awaitTermination(180)


def test_stream_route_exactly_once_across_restarts(spark, tmp_path):
    drop_dir = str(tmp_path / "drop")
    tables = {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(
            str(tmp_path / "reviews"), spark, schema=REVIEWS, n_buckets=4
        ),
    }
    _write_drop(drop_dir, "a.jsonl", _lines(0, 60), seq=1)
    _write_drop(drop_dir, "b.jsonl", _lines(60, 120), seq=2)
    _drain(spark, drop_dir, tables, tmp_path)

    # expected state: LWW over all healthy envelopes (monotone ts -> last
    # offset per (table, key) wins)
    expect = {"files": {}, "reviews": {}}
    for i in range(120):
        key = (f"r{i % 4}", f"p{i % 15}", "head")
        if i % 3 == 0:
            expect["reviews"][key] = (f"u{i % 5}", i)
        else:
            expect["files"][key] = ("py", f"c{i}")
    got_files = {
        (r["repo"], r["path"], r["commit"]): (r["lang"], r["content"])
        for r in tables["files"].read().collect()
    }
    got_reviews = {
        (r["repo"], r["path"], r["commit"]): (r["reviewer"], r["score"])
        for r in tables["reviews"].read().collect()
    }
    assert got_files == expect["files"]
    assert got_reviews == expect["reviews"]

    # the quarantine holds exactly the one bad line, once
    dlq = spark.read.parquet(str(tmp_path / "dlq") + "/*")
    assert [r["reason"] for r in dlq.collect()] == ["unparseable"]

    # restart over the same checkpoint with nothing new: no new versions
    versions = {name: t.version for name, t in tables.items()}
    _drain(spark, drop_dir, tables, tmp_path)
    assert {name: t.version for name, t in tables.items()} == versions

    # new files after restart land incrementally
    _write_drop(drop_dir, "c.jsonl", _lines(120, 140), seq=3)
    _drain(spark, drop_dir, tables, tmp_path)
    assert tables["files"].read().where(F.col("content") == "c121").count() == 1


def test_stream_route_skip_empty_no_empty_commits(spark, tmp_path):
    """skip_empty (default on): a micro-batch touching only `files` must not
    commit a version to `reviews` — its version stays put while `files`
    advances (VERDICT r4 ask #6: at 10^3 registered tables, a commit floor
    per table per poll is the scale killer).  A later reviews-only batch
    then advances only `reviews`."""
    drop_dir = str(tmp_path / "drop")
    tables = {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(
            str(tmp_path / "reviews"), spark, schema=REVIEWS, n_buckets=4
        ),
    }
    files_only = [
        _envelope("files", i + 1, "update",
                  {"repo": "r0", "path": f"p{i}", "commit": "head",
                   "lang": "py", "content": f"c{i}"})
        for i in range(8)
    ]
    _write_drop(drop_dir, "a.jsonl", files_only, seq=1)
    _drain(spark, drop_dir, tables, tmp_path)

    v_files, v_reviews = tables["files"].version, tables["reviews"].version
    assert v_reviews == 0, "reviews saw no events but committed a version"
    assert v_files > 0
    assert tables["files"].read().count() == 8

    reviews_only = [
        _envelope("reviews", 100 + i, "insert",
                  {"repo": "r1", "path": f"q{i}", "commit": "head",
                   "reviewer": "u1", "score": i})
        for i in range(5)
    ]
    _write_drop(drop_dir, "b.jsonl", reviews_only, seq=2)
    _drain(spark, drop_dir, tables, tmp_path)
    assert tables["files"].version == v_files, "files committed on a reviews-only batch"
    assert tables["reviews"].version > 0
    assert tables["reviews"].read().count() == 5


def test_stream_route_skip_empty_false_commits_every_table(spark, tmp_path):
    drop_dir = str(tmp_path / "drop")
    tables = {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(
            str(tmp_path / "reviews"), spark, schema=REVIEWS, n_buckets=4
        ),
    }
    files_only = [
        _envelope("files", i + 1, "update",
                  {"repo": "r0", "path": f"p{i}", "commit": "head",
                   "lang": "py", "content": f"c{i}"})
        for i in range(4)
    ]
    _write_drop(drop_dir, "a.jsonl", files_only, seq=1)
    raw = spark.readStream.schema("value string").text(drop_dir)
    q = stream_route(
        raw, tables, SCHEMAS,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        skip_empty=False,
    )
    q.awaitTermination(180)
    # legacy posture: the untouched table's watermark tracks the frontier
    # via an empty commit
    assert tables["reviews"].version > 0
    assert tables["reviews"].read().count() == 0
    assert tables["files"].read().count() == 4


def test_stream_route_debezium_decoder(spark, tmp_path):
    """The pluggable decoder (ADVICE r4): a Debezium-shaped single stream
    tails through the same streaming front-end."""
    from valentine_spark.cdc import decode_debezium_routed

    drop_dir = str(tmp_path / "drop")
    os.makedirs(drop_dir)
    tables = {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(
            str(tmp_path / "reviews"), spark, schema=REVIEWS, n_buckets=4
        ),
    }
    lines = []
    for i in range(6):
        img = {"repo": "r0", "path": f"p{i}", "commit": "head",
               "lang": "py", "content": f"c{i}"}
        lines.append(json.dumps({
            "before": None, "after": img, "op": "c",
            "ts_ms": 1_700_000_000_000 + i, "source": {"lsn": i + 1, "table": "files"},
        }))
    _write_drop(drop_dir, "a.jsonl", lines, seq=1)
    raw = spark.readStream.schema("value string").text(drop_dir)
    q = stream_route(
        raw, tables, SCHEMAS,
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        decoder=decode_debezium_routed,
    )
    q.awaitTermination(180)
    assert tables["files"].read().count() == 6
    # skip_empty + debezium dialect probe: reviews stayed untouched
    assert tables["reviews"].version == 0
