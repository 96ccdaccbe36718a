"""Model-based fuzz of the multi-table routing surface: a seeded random
envelope stream (two tables with different payload schemas, shared key
pool so tables overwrite/delete aggressively, heavy op_ts collisions so
the LSN tie-break matters, plus injected corruption — truncated JSON,
unknown tables, missing keys) is decoded and applied in random LSN-range
slices with random replayed slices; each lake must equal a plain Python
dict model applying the healthy events in (op_ts, lsn) order, and the
dead-letter counts must equal the model's corruption census.

Deterministic seeds — a failure replays exactly.
"""

import json
import random

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from valentine_spark.cdc import LakeTable, apply_routed, decode_maxwell_routed

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
BASE = 1 << 40  # maxwell_position_lsn("mysql-bin.000001:o") = BASE + o


@pytest.mark.parametrize("seed", [3, 29])
def test_router_equals_model_under_random_streams(spark, tmp_path, seed):
    rng = random.Random(seed)
    keys = [(f"r{i % 5}", f"p{i}", "head") for i in range(12)]
    n = 240
    envelopes, healthy, expected_dlq = [], [], {}

    for offset in range(1, n + 1):
        # binlog invariant (the stream contract every replay assumes, see
        # __spark_entry__._wal_stream): op_ts non-decreasing in LSN —
        # plateaus of 40 offsets give heavy ties so the lsn tie-break and
        # cross-slice boundaries are both exercised
        ts = 1_700_000_000 + offset // 40
        corrupt = rng.random()
        table = rng.choice(["files", "reviews"])
        op = "delete" if rng.random() < 0.25 else "update"
        repo, path, commit = rng.choice(keys)
        data = {"repo": repo, "path": path, "commit": commit}
        if table == "files":
            data.update({"lang": rng.choice(["py", "go"]),
                         "content": f"c{offset}-{rng.randint(0, 99)}"})
        else:
            data.update({"reviewer": f"u{rng.randint(0, 3)}",
                         "score": rng.randint(0, 1000)})
        env = {
            "database": "gh", "table": table, "type": op, "ts": ts,
            "xid": offset, "position": f"mysql-bin.000001:{offset}",
            "data": data, "old": None,
        }
        if corrupt < 0.05:
            envelopes.append(json.dumps(env)[:-7])
            expected_dlq["unparseable"] = expected_dlq.get("unparseable", 0) + 1
        elif corrupt < 0.10:
            env["table"] = "ghosts"
            envelopes.append(json.dumps(env))
            expected_dlq["unknown_table"] = expected_dlq.get("unknown_table", 0) + 1
        elif corrupt < 0.15:
            del env["data"]["repo"]
            envelopes.append(json.dumps(env))
            expected_dlq["missing_key"] = expected_dlq.get("missing_key", 0) + 1
        else:
            envelopes.append(json.dumps(env))
            healthy.append((table, ts, offset, op, data))

    # model: per-table LWW in (op_ts, lsn) order; deletes drop the key
    model = {"files": {}, "reviews": {}}
    for table, ts, offset, op, data in sorted(healthy, key=lambda h: (h[1], h[2])):
        key = (data["repo"], data["path"], data["commit"])
        if op == "delete":
            model[table].pop(key, None)
        else:
            model[table][key] = data

    raw = spark.createDataFrame([(v,) for v in envelopes], ["value"])
    routed = decode_maxwell_routed(raw, SCHEMAS)
    lakes = {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(
            str(tmp_path / "reviews"), spark, schema=REVIEWS, n_buckets=4
        ),
    }

    # random complete LSN-range slicing, applied in order; random replays
    cuts = sorted(rng.sample(range(2, n), rng.randint(0, 3)))
    ranges = list(zip([1] + [c for c in cuts], [c for c in cuts] + [n + 1]))
    from pyspark.sql import functions as F

    applied = []
    for lo, hi in ranges:
        sliced = {
            name: df.where(
                (F.col("lsn") >= BASE + lo) & (F.col("lsn") < BASE + hi)
            )
            for name, df in routed.streams.items()
        }
        res = apply_routed(
            lakes, sliced, f"s-{lo}-{hi}", watermark_lsn=BASE + hi - 1,
            parallelism=rng.choice([1, 2]),
        )
        applied.append((lo, hi, sliced))
        assert all(not r.get("skipped") for r in res.values())
        if applied and rng.random() < 0.5:
            rlo, rhi, rsliced = applied[rng.randrange(len(applied))]
            rres = apply_routed(lakes, rsliced, f"s-{rlo}-{rhi}")
            assert all(r.get("skipped") for r in rres.values())

    for name in SCHEMAS:
        got = {
            (r["repo"], r["path"], r["commit"]): r.asDict()
            for r in lakes[name].read().collect()
        }
        want = model[name]
        assert set(got) == set(want), f"{name}: key set diverged (seed {seed})"
        for key, data in want.items():
            for col, val in data.items():
                assert got[key][col] == val, (name, key, col, seed)

    dlq = {
        r["reason"]: r["n"]
        for r in routed.dead_letters.groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert dlq == expected_dlq, f"dead-letter census diverged (seed {seed})"


@pytest.mark.parametrize("seed", [7, 61])
def test_replay_routed_fuzz_multi_binlog_files(spark, tmp_path, seed):
    """Fuzz the occupied-slice derivation together with LSN packing and
    cross-file ordering: envelopes draw binlog file numbers 1-3 (offsets
    restart per file, op_ts non-decreasing in (file, offset) order — the
    binlog invariant), random batch_lsns, random corruption.  replay_routed
    must walk exactly the occupied slices (asserted against a Python
    recomputation of `lsn DIV batch_lsns`), converge every lake to the
    model, and keep the dead-letter census."""
    from valentine_spark.cdc import replay_routed

    rng = random.Random(seed)
    keys = [(f"r{i % 4}", f"p{i}", "head") for i in range(10)]
    n = 180
    # two random rollover points split the stream into files 1..3
    cut_a, cut_b = sorted(rng.sample(range(20, n - 20), 2))
    envelopes, healthy, expected_dlq, lsns = [], [], {}, []

    for i in range(1, n + 1):
        fileno = 1 + (i > cut_a) + (i > cut_b)
        offset = i - (0 if fileno == 1 else cut_a if fileno == 2 else cut_b) + 3
        lsn = (fileno << 40) + offset
        ts = 1_700_000_000 + i // 30  # plateaus; non-decreasing across files
        table = rng.choice(["files", "reviews"])
        op = "delete" if rng.random() < 0.25 else "update"
        repo, path, commit = rng.choice(keys)
        data = {"repo": repo, "path": path, "commit": commit}
        if table == "files":
            data.update({"lang": rng.choice(["py", "go"]),
                         "content": f"c{i}-{rng.randint(0, 99)}"})
        else:
            data.update({"reviewer": f"u{rng.randint(0, 3)}",
                         "score": rng.randint(0, 1000)})
        env = {
            "database": "gh", "table": table, "type": op, "ts": ts,
            "xid": i, "position": f"mysql-bin.{fileno:06d}:{offset}",
            "data": data, "old": None,
        }
        corrupt = rng.random()
        if corrupt < 0.04:
            envelopes.append(json.dumps(env)[:-5])
            expected_dlq["unparseable"] = expected_dlq.get("unparseable", 0) + 1
        elif corrupt < 0.08:
            env["table"] = "phantom"
            envelopes.append(json.dumps(env))
            expected_dlq["unknown_table"] = expected_dlq.get("unknown_table", 0) + 1
        else:
            envelopes.append(json.dumps(env))
            healthy.append((table, ts, lsn, op, data))
            lsns.append((table, lsn))

    model = {"files": {}, "reviews": {}}
    for table, ts, lsn, op, data in sorted(healthy, key=lambda h: (h[1], h[2])):
        key = (data["repo"], data["path"], data["commit"])
        if op == "delete":
            model[table].pop(key, None)
        else:
            model[table][key] = data

    raw = spark.createDataFrame([(v,) for v in envelopes], ["value"])
    lakes = {
        "files": LakeTable.create(str(tmp_path / "files"), spark, n_buckets=4),
        "reviews": LakeTable.create(
            str(tmp_path / "reviews"), spark, schema=REVIEWS, n_buckets=4
        ),
    }
    batch_lsns = rng.choice([1_000, 1_000_000, 1 << 39])
    commits = replay_routed(lakes, raw, SCHEMAS, batch_lsns=batch_lsns)

    # slice walk must be exactly the occupied keys (never the dense range,
    # which spans >= 2 * 2^40 / batch_lsns slices here)
    want_keys = sorted({l // batch_lsns for _, l in lsns})
    assert len(commits) == len(want_keys), (seed, batch_lsns)
    # per-slice membership = tables occupied in that slice (skip_empty)
    per_table_keys = {
        t: {l // batch_lsns for tt, l in lsns if tt == t} for t in SCHEMAS
    }
    for k, batch in zip(want_keys, commits):
        want_members = sorted(t for t in SCHEMAS if k in per_table_keys[t])
        assert sorted(batch) == want_members, (seed, k)

    for name in SCHEMAS:
        got = {
            (r["repo"], r["path"], r["commit"]): r.asDict()
            for r in lakes[name].read().collect()
        }
        want = model[name]
        assert set(got) == set(want), f"{name}: key set diverged (seed {seed})"
        for key, data in want.items():
            for col, val in data.items():
                assert got[key][col] == val, (name, key, col, seed)

    routed = decode_maxwell_routed(raw, SCHEMAS)
    from pyspark.sql import functions as F
    dlq = {
        r["reason"]: r["n"]
        for r in routed.dead_letters.groupBy("reason")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert dlq == expected_dlq, f"dead-letter census diverged (seed {seed})"
