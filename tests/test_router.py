"""Multi-table WAL routing (cdc/router.py): one Maxwell envelope stream
demultiplexed into per-table canonical streams with heterogeneous payload
schemas, then applied to per-table lakes exactly-once.

Covers: routing cascade (unparseable / missing_table / unknown_table / per-
table quarantine with table tag), heterogeneous payloads, crash-resume
between table applies (per-table batch-id idempotence), parallel==sequential
apply equality, and replay_routed end-to-end vs the single-threaded oracle.
"""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from valentine_spark.cdc import (
    LakeTable,
    apply_batch,
    apply_routed,
    decode_maxwell_routed,
    oracle_replay,
    replay_routed,
)

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


def _data(table, i, ver=0):
    base = {"repo": f"org/r{i % 3}", "path": f"src/f{i}.py", "commit": "head"}
    if table == "files":
        base.update({"lang": "python", "content": f"body-{i}-v{ver}"})
    else:
        base.update({"reviewer": f"rev{i % 5}", "score": 10 * i + ver})
    return base


def _env(table, i, typ="update", ver=0, offset=None, drop=(), binlog=1):
    env = {
        "database": "gh",
        "table": table,
        "type": typ,
        "ts": 1_700_000_000 + i,
        "xid": i,
        "position": f"mysql-bin.{binlog:06d}:{offset if offset is not None else i + 1}",
        "data": _data(table, i, ver),
        "old": None,
    }
    for k in drop:
        env.pop(k, None)
    return json.dumps(env)


def _raw(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["value"])


def test_routing_cascade_and_heterogeneous_payloads(spark):
    rows = [
        _env("files", 0, "insert"),
        _env("reviews", 1, "insert"),
        _env("files", 2, "delete"),
        _env("ghosts", 3),                 # unknown_table
        _env("files", 4, drop=("table",)),  # missing_table
        '{"table": "files", "type":',      # unparseable
        _env("files", 6, "truncate"),      # routed, then unknown_op in-table
    ]
    out = decode_maxwell_routed(_raw(spark, rows), SCHEMAS)
    assert set(out.streams) == {"files", "reviews"}
    files = {r["path"]: r for r in out.streams["files"].collect()}
    assert set(files) == {"src/f0.py", "src/f2.py"}
    assert files["src/f2.py"]["op"] == "delete"
    reviews = out.streams["reviews"].collect()
    assert len(reviews) == 1
    assert reviews[0]["reviewer"] == "rev1" and reviews[0]["score"] == 10
    dead = {(r["table"], r["reason"]) for r in out.dead_letters.collect()}
    assert dead == {
        ("ghosts", "unknown_table"),
        (None, "missing_table"),
        (None, "unparseable"),
        ("files", "unknown_op"),
    }


def test_debezium_routing_by_source_table(spark):
    """The Debezium-shaped router: route by source.table, decode each slice
    with the Debezium envelope semantics (after-image, ts_ms milliseconds,
    source.lsn), same cascade."""
    from valentine_spark.cdc import decode_debezium_routed

    def dbz(table, i, op="u"):
        img = _data("files" if table == "files" else "reviews", i)
        return json.dumps(
            {
                "before": img if op == "d" else None,
                "after": None if op == "d" else img,
                "op": op,
                "ts_ms": 1_700_000_000_000 + i,
                "source": {"lsn": i + 1, "table": table},
            }
        )

    rows = [
        dbz("files", 0), dbz("files", 1, "d"), dbz("reviews", 2, "c"),
        dbz("ghosts", 3),                    # unknown_table
        '{"op": "u", "source": {',           # unparseable
        json.dumps({"op": "u", "after": {}, "ts_ms": 5, "source": {"lsn": 9}}),  # missing_table
    ]
    out = decode_debezium_routed(_raw(spark, rows), SCHEMAS)
    files = {r["lsn"]: r for r in out.streams["files"].collect()}
    assert set(files) == {1, 2} and files[2]["op"] == "delete"
    assert files[1]["op_ts"].year == 2023  # ts_ms is milliseconds
    reviews = out.streams["reviews"].collect()
    assert len(reviews) == 1 and reviews[0]["reviewer"] == "rev2"
    dead = {(r["table"], r["reason"]) for r in out.dead_letters.collect()}
    assert dead == {
        ("ghosts", "unknown_table"),
        (None, "unparseable"),
        (None, "missing_table"),
    }


def test_empty_schemas_rejected(spark):
    with pytest.raises(ValueError, match="at least one table"):
        decode_maxwell_routed(_raw(spark, ["{}"]), {})


def _mklakes(spark, tmp_path):
    return {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(str(tmp_path / "reviews"), spark, n_buckets=4),
    }


def test_apply_routed_exactly_once_and_crash_resume(spark, tmp_path):
    lakes = _mklakes(spark, tmp_path)
    rows = [_env("files", i, "insert") for i in range(6)] + [
        _env("reviews", i, "insert", offset=100 + i) for i in range(4)
    ]
    routed = decode_maxwell_routed(_raw(spark, rows), SCHEMAS)

    # simulate a crash that committed only the files half of batch b1
    pre = apply_batch(lakes["files"], routed.streams["files"], "b1/files")
    assert not pre.get("skipped")
    res = apply_routed(lakes, routed.streams, "b1")
    assert res["files"]["skipped"] is True
    assert not res["reviews"].get("skipped")
    assert lakes["files"].read().count() == 6
    assert lakes["reviews"].read().count() == 4
    # full re-run: everything skips
    res2 = apply_routed(lakes, routed.streams, "b1")
    assert all(r["skipped"] for r in res2.values())


def test_apply_routed_unknown_table_raises(spark, tmp_path):
    lakes = {"files": LakeTable.create(str(tmp_path / "f"), spark, n_buckets=4)}
    routed = decode_maxwell_routed(
        _raw(spark, [_env("reviews", 0, "insert")]), SCHEMAS
    )
    with pytest.raises(KeyError, match="reviews"):
        apply_routed(lakes, routed.streams, "b1")


def test_parallel_equals_sequential(spark, tmp_path):
    rows = []
    for i in range(40):
        rows.append(_env("files", i, "insert", ver=0, offset=i))
        rows.append(_env("files", i % 7, "update", ver=i, offset=1000 + i))
        rows.append(_env("reviews", i % 11, "insert", ver=i, offset=2000 + i))
    routed = decode_maxwell_routed(_raw(spark, rows), SCHEMAS)
    seq = _mklakes(spark, tmp_path / "seq")
    par = _mklakes(spark, tmp_path / "par")
    apply_routed(seq, routed.streams, "b1", parallelism=1)
    apply_routed(par, routed.streams, "b1", parallelism=4)
    for name in seq:
        assert seq[name].state_checksum() == par[name].state_checksum()


def test_routed_decode_zero_shuffle_no_python(spark):
    """The docstring claims for decode_maxwell_routed ('all decode work is
    JVM from_json + projections, zero Python, zero shuffles'), asserted on
    the physical plans of every output: no Exchange, no
    BatchEvalPython/ArrowEvalPython, JVM codegen present."""
    from valentine_spark.plans import explain_str

    rows = [_env("files", i, "insert") for i in range(8)] + [
        _env("reviews", i, "insert", offset=50 + i) for i in range(8)
    ]
    out = decode_maxwell_routed(_raw(spark, rows), SCHEMAS)
    frames = {"dead_letters": out.dead_letters, **out.streams}
    for name, df in frames.items():
        plan = explain_str(df)
        assert "Exchange" not in plan, (name, plan)
        assert "EvalPython" not in plan, (name, plan)
        assert "codegen id" in plan or "WholeStageCodegen" in plan, (name, plan)


def test_routed_drift_automap(spark, tmp_path):
    """Composition with the schema-evolution subsystem: one routed table's
    connector registers a drifted payload schema (lang -> language), and
    apply_routed resolves it through the standard matcher cascade — the
    mapping lands in that table's commit lineage, the other table is
    untouched."""
    drifted_files = StructType(
        [
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("commit", StringType()),
            StructField("language", StringType()),
            StructField("content", StringType()),
        ]
    )

    def _env_drifted(i, offset):
        d = _data("files", i)
        d["language"] = d.pop("lang")
        env = {
            "database": "gh", "table": "files", "type": "insert",
            "ts": 1_700_000_000 + i, "xid": i,
            "position": f"mysql-bin.000001:{offset}", "data": d, "old": None,
        }
        return json.dumps(env)

    rows = [_env_drifted(i, i + 1) for i in range(12)] + [
        _env("reviews", i, "insert", offset=100 + i) for i in range(5)
    ]
    lakes = _mklakes(spark, tmp_path)
    routed = decode_maxwell_routed(
        _raw(spark, rows), {"files": drifted_files, "reviews": REVIEWS}
    )
    res = apply_routed(lakes, routed.streams, "b1")
    assert not res["files"].get("skipped")
    got = lakes["files"].read()
    assert "lang" in got.columns and "language" not in got.columns
    assert got.where(F.col("lang").isNotNull()).count() == 12
    assert res["files"].get("drift_mapping") == {"language": "lang"}
    assert lakes["reviews"].read().count() == 5


def test_replay_routed_matches_oracle(spark, tmp_path):
    rows = []
    for i in range(30):
        rows.append(_env("files", i % 9, "update", ver=i, offset=i + 1))
        if i % 5 == 0:
            rows.append(_env("files", i % 9, "delete", ver=i, offset=500 + i))
        rows.append(_env("reviews", i % 6, "update", ver=i, offset=900 + i))
    lakes = _mklakes(spark, tmp_path)
    commits = replay_routed(lakes, _raw(spark, rows), SCHEMAS, batch_lsns=1 << 41)
    assert len(commits) >= 1
    routed = decode_maxwell_routed(_raw(spark, rows), SCHEMAS)
    for name in SCHEMAS:
        want = oracle_replay(routed.streams[name].collect())
        got = {
            (r["repo"], r["path"], r["commit"]): r.asDict()
            for r in lakes[name].read().collect()
        }
        assert set(got) == set(want)
        for k in want:
            for c in want[k]:
                assert got[k][c] == want[k][c], (name, k, c)
    # resumable: a second replay of the same raw stream is a no-op
    commits2 = replay_routed(lakes, _raw(spark, rows), SCHEMAS, batch_lsns=1 << 41)
    assert all(r["skipped"] for batch in commits2 for r in batch.values())


def test_replay_routed_binlog_rollover_walks_only_occupied_slices(spark, tmp_path):
    """A Maxwell stream spanning mysql-bin.000001 + 000002 (+ a far 000007):
    consecutive binlog files are ~2^40 apart in packed-LSN space
    (cdc/wal.py::maxwell_position_lsn), so a dense range walk would iterate
    ~(2^40 / batch_lsns) empty slices per rollover — round 4's scale
    defect.  The occupied-slice derivation must complete in O(occupied
    slices), converge to the single-stream oracle, and stay resumable."""
    rows = []
    for i in range(12):
        rows.append(_env("files", i % 5, "update", ver=i, offset=i + 4, binlog=1))
    for i in range(12, 24):
        # offsets restart in a fresh binlog file, ts keeps rising
        rows.append(_env("files", i % 5, "update", ver=i, offset=i - 8, binlog=2))
        rows.append(_env("reviews", i % 3, "update", ver=i, offset=200 + i, binlog=2))
    # a far-future file: two rollover gaps, one of ~5 * 2^40 LSNs
    rows.append(_env("files", 0, "delete", ver=99, offset=4, binlog=7))

    lakes = _mklakes(spark, tmp_path)
    batch_lsns = 1_000_000  # dense walk would need ~6 * 2^40 / 10^6 ~ 6.6M slices
    commits = replay_routed(lakes, _raw(spark, rows), SCHEMAS, batch_lsns=batch_lsns)

    # O(occupied): every event in a file sits in that file's first slices
    # (offsets < batch_lsns), so exactly one occupied slice per binlog file
    assert len(commits) == 3, f"expected 3 occupied slices, walked {len(commits)}"
    # skip_empty: reviews only ever appear in file 2's slice
    tables_per_slice = [sorted(batch) for batch in commits]
    assert tables_per_slice == [["files"], ["files", "reviews"], ["files"]]

    routed = decode_maxwell_routed(_raw(spark, rows), SCHEMAS)
    for name in SCHEMAS:
        want = oracle_replay(routed.streams[name].collect())
        got = {
            (r["repo"], r["path"], r["commit"]): r.asDict()
            for r in lakes[name].read().collect()
        }
        assert set(got) == set(want), name
        for k in want:
            for c in want[k]:
                assert got[k][c] == want[k][c], (name, k, c)

    # resumable: identical re-run derives identical slice keys and skips all
    commits2 = replay_routed(lakes, _raw(spark, rows), SCHEMAS, batch_lsns=batch_lsns)
    assert [sorted(b) for b in commits2] == tables_per_slice
    assert all(r["skipped"] for batch in commits2 for r in batch.values())


def test_replay_routed_skip_empty_false_commits_every_table(spark, tmp_path):
    rows = [_env("files", i, "update", offset=i + 4, binlog=3) for i in range(4)]
    lakes = _mklakes(spark, tmp_path)
    commits = replay_routed(
        lakes, _raw(spark, rows), SCHEMAS, batch_lsns=1_000_000, skip_empty=False
    )
    assert len(commits) == 1
    # reviews had no events anywhere but still gets its (empty) commit
    assert sorted(commits[0]) == ["files", "reviews"]
    assert lakes["reviews"].read().count() == 0


def test_replay_routed_rejects_nonpositive_batch_lsns(spark, tmp_path):
    lakes = _mklakes(spark, tmp_path)
    raw = _raw(spark, [_env("files", 0, "update")])
    with pytest.raises(ValueError, match="batch_lsns"):
        replay_routed(lakes, raw, SCHEMAS, batch_lsns=0)
