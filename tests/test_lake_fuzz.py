"""Model-based fuzz of the lake's mutation surface: a seeded random
sequence of operations (MERGE upsert/delete, predicate UPDATE/DELETE,
conditional MERGE INTO, compaction incl. Z-order, rename evolution,
defaulted column add, type widening, alter-properties, branch fork +
write-audit-publish, rebucket, snapshot expiry) runs against BOTH the
LakeTable and a plain Python-dict model; the table must equal the model
at every checkpoint.

This is the composition test the per-feature suites cannot give: every
pairwise interleaving of features (mutate after rename, MERGE INTO over
a z-ordered layout, widen after rename after defaulted add, publish
after compact, expiry mid-sequence...) falls out of the random schedule.
Deterministic seeds — a failure replays exactly.
"""

import random

import pytest
from pyspark.sql import functions as F

from valentine_spark.cdc import LakeTable


def _spark_rows(spark, rows):
    cols = "repo string, path string, commit string, lang string, content string"
    return spark.createDataFrame(rows, cols)


def _key_rows(spark, keys):
    return spark.createDataFrame(
        [tuple(k) for k in keys], "repo string, path string, commit string"
    )


LANGS = ["py", "go", "rs", "ts"]


@pytest.mark.parametrize("seed", [11, 47])
def test_lake_equals_model_under_random_ops(spark, tmp_path, seed):
    from pyspark.sql import types as T

    from valentine_spark.sources.lake_batch import register_lake

    register_lake(spark)
    rng = random.Random(seed)
    lake = LakeTable.create(
        str(tmp_path / f"f{seed}"), spark, n_buckets=4, target_file_rows=64,
        stats_cols=["lang"],
    )
    model = {}  # (repo,path,commit) -> tuple aligned with `payload`
    payload = ["lang", "content"]  # current payload column names
    # third payload column added mid-run by the evolve op: (added?, widened?)
    stars_state = {"added": False, "widened": False, "name": None}
    batch_no = 0

    def schema_str():
        base = "repo string, path string, commit string, lang string, content string"
        if stars_state["added"]:
            base += ", stars " + ("bigint" if stars_state["widened"] else "int")
        return base

    def rand_payload():
        v = (rng.choice(LANGS), f"c{rng.randrange(1000)}")
        if stars_state["added"]:
            v += (
                2**40 + rng.randrange(100)
                if stars_state["widened"]
                else rng.randrange(100),
            )
        return v

    def rows_df(mapping):
        return spark.createDataFrame(
            [(k + v) for k, v in mapping.items()], schema_str()
        ).toDF("repo", "path", "commit", *payload)

    def new_key():
        return (f"r{rng.randrange(6)}", f"p{rng.randrange(400)}", "head")

    def check():
        got = {
            tuple(r[:3]): tuple(r[c] for c in payload)
            for r in lake.read().collect()
        }
        assert got == model, f"divergence at op {i} (seed {seed})"
        # the batch `lake` data source must agree with the model through
        # every random interleaving too (renames, widens, defaults, MoR
        # dirt, rebuckets, expiry — the composition surface)
        via_ds = {
            tuple(r[:3]): tuple(r[c] for c in payload)
            for r in spark.read.format("lake").load(lake.root).collect()
        }
        assert via_ds == model, f"data-source divergence at op {i} (seed {seed})"

    for i in range(30):
        op = rng.choice(
            ["merge", "merge", "merge", "mutate", "merge_into", "compact",
             "rename", "branch", "rebucket", "expire", "alter_props"]
        )
        # deterministic injection points so every seed exercises the
        # evolution surface: defaulted add at op 9, widen at op 18
        if i == 9:
            op = "evolve_default"
        elif i == 18:
            op = "widen"
        if op == "merge":
            ups, dels = {}, set()
            for _ in range(rng.randrange(5, 40)):
                k = new_key()
                if rng.random() < 0.2:
                    dels.add(k)
                    ups.pop(k, None)
                else:
                    ups[k] = rand_payload()
                    dels.discard(k)
            batch_no += 1
            lake.merge(
                rows_df(ups), _key_rows(spark, sorted(dels)), f"b{batch_no}",
                mode=rng.choice(["cow", "mor"]),
            )
            model.update(ups)
            for k in dels:
                model.pop(k, None)
        elif op == "mutate":
            lang = rng.choice(LANGS)
            if rng.random() < 0.5:
                lake.delete_where([(payload[0], "=", lang)])
                model = {k: v for k, v in model.items() if v[0] != lang}
            else:
                lake.update_where(
                    [(payload[0], "=", lang)], {payload[1]: F.lit(f"u{i}")}
                )
                model = {
                    k: ((v[0], f"u{i}") + v[2:] if v[0] == lang else v)
                    for k, v in model.items()
                }
        elif op == "merge_into":
            touched = rng.sample(sorted(model), k=min(len(model), 20)) if model else []
            fresh = [new_key() for _ in range(5)]
            src_keys = list(dict.fromkeys(touched + fresh))
            ins_payload = rand_payload()
            src = rows_df({k: ("zz", f"m{i}") + ins_payload[2:] for k in src_keys})
            (
                lake.merge_into(src)
                .when_matched_delete(condition=F.col(f"t.{payload[0]}") == "rs")
                .when_matched_update({payload[1]: F.col(f"s.{payload[1]}")})
                .when_not_matched_insert()
                .execute()
            )
            for k in src_keys:
                if k in model:
                    if model[k][0] == "rs":
                        del model[k]
                    else:
                        model[k] = (model[k][0], f"m{i}") + model[k][2:]
                else:
                    model[k] = ("zz", f"m{i}") + ins_payload[2:]
        elif op == "compact":
            if rng.random() < 0.5:
                lake.compact(min_files=1, sort_cols=payload[:2], zorder=True)
            else:
                lake.compact(min_files=rng.choice([1, 2]))
        elif op == "rename":
            which = rng.randrange(len(payload))
            new_name = f"{payload[which].rstrip('0123456789_x')}_x{i}"
            lake.rename_column(payload[which], new_name)
            payload[which] = new_name
            if which == 2:
                stars_state["name"] = new_name
        elif op == "evolve_default":
            if not stars_state["added"]:
                lake.evolve_schema(
                    [T.StructField("stars", T.IntegerType())], "fuzz add",
                    defaults={"stars": 0},
                )
                stars_state["added"] = True
                stars_state["name"] = "stars"
                payload.append("stars")
                # initial default: every pre-add row reads 0
                model = {k: v + (0,) for k, v in model.items()}
        elif op == "widen":
            if stars_state["added"] and not stars_state["widened"]:
                lake.widen_column(stars_state["name"], T.LongType())
                stars_state["widened"] = True
        elif op == "alter_props":
            lake.alter_properties(
                stats_cols=rng.choice([[payload[0]], payload[:2], []]),
                target_file_rows=rng.choice([48, 64, 96]),
            )
        elif op == "branch":
            b = lake.create_branch(f"wap{i}")
            ups = {new_key(): ("br", f"w{i}") + rand_payload()[2:] for _ in range(10)}
            batch_no += 1
            b.merge(rows_df(ups), _key_rows(spark, []), f"b{batch_no}")
            lake.fast_forward(f"wap{i}")
            lake.delete_branch(f"wap{i}")
            model.update(ups)
        elif op == "rebucket":
            lake.rebucket(8 if lake.metadata()["n_buckets"] == 4 else 4)
        elif op == "expire":
            lake.expire_snapshots(keep_last=2)
        if i % 5 == 4:
            check()
    check()
    assert stars_state["added"] and stars_state["widened"]
    # final invariants: metadata tables agree with state; history is intact
    assert lake.files().where("kind = 'data'").agg(
        F.sum("rows")
    ).first()[0] >= len(model)  # (>= because dirty MoR buckets multi-version)
    lake.compact(min_files=1)
    assert lake.files().where("kind = 'data'").agg(F.sum("rows")).first()[0] == len(model)


@pytest.mark.parametrize("seed", [5])
def test_changes_reconstructs_model_deltas(spark, tmp_path, seed):
    """Changelog consistency under the same random schedule: between any
    two checkpoints, applying changes(v0, v1) to the model snapshot at v0
    must yield the model snapshot at v1 — across COW/MoR merges,
    predicate mutations, MERGE INTO, compactions (which must contribute
    NOTHING to the changelog) and rename evolution (values must arrive
    under the to-version names)."""
    rng = random.Random(seed)
    lake = LakeTable.create(
        str(tmp_path / f"c{seed}"), spark, n_buckets=4, target_file_rows=64
    )
    model = {}
    payload = ["lang", "content"]
    snapshots = [(lake.version, dict(model), list(payload))]
    batch_no = 0

    for i in range(16):
        op = rng.choice(["merge", "merge", "mutate", "merge_into", "compact", "rename"])
        if op == "merge":
            ups, dels = {}, set()
            for _ in range(rng.randrange(5, 30)):
                k = (f"r{rng.randrange(5)}", f"p{rng.randrange(200)}", "head")
                if rng.random() < 0.25 and k in model:
                    dels.add(k)
                    ups.pop(k, None)
                else:
                    ups[k] = (rng.choice(LANGS), f"c{rng.randrange(1000)}")
                    dels.discard(k)
            batch_no += 1
            up_df = _spark_rows(spark, [(k + v) for k, v in ups.items()]).toDF(
                "repo", "path", "commit", *payload
            )
            lake.merge(up_df, _key_rows(spark, sorted(dels)), f"b{batch_no}",
                       mode=rng.choice(["cow", "mor"]))
            model.update(ups)
            for k in dels:
                model.pop(k, None)
        elif op == "mutate":
            lang = rng.choice(LANGS)
            lake.delete_where([(payload[0], "=", lang)])
            model = {k: v for k, v in model.items() if v[0] != lang}
        elif op == "merge_into":
            touched = rng.sample(sorted(model), k=min(len(model), 10)) if model else []
            src = _spark_rows(spark, [k + ("zz", f"m{i}") for k in touched]).toDF(
                "repo", "path", "commit", *payload
            )
            if touched:
                (lake.merge_into(src)
                 .when_matched_update({payload[1]: F.col(f"s.{payload[1]}")})
                 .execute())
                for k in touched:
                    model[k] = (model[k][0], f"m{i}")
        elif op == "compact":
            lake.compact(min_files=1)
        elif op == "rename":
            new_name = f"{payload[1].split('_')[0]}_y{i}"
            lake.rename_column(payload[1], new_name)
            payload[1] = new_name
        snapshots.append((lake.version, dict(model), list(payload)))

    # every adjacent checkpoint pair: model(v0) + changes(v0, v1) == model(v1)
    for (v0, m0, _), (v1, m1, pay1) in zip(snapshots, snapshots[1:]):
        ch = lake.changes(v0, v1).collect()
        replayed = dict(m0)
        for r in ch:
            k = (r["repo"], r["path"], r["commit"])
            if r["change_op"] == "delete":
                replayed.pop(k, None)
            else:
                replayed[k] = (r[pay1[0]], r[pay1[1]])
        assert replayed == m1, f"changelog window v{v0}->v{v1} diverged (seed {seed})"


@pytest.mark.parametrize("seed", [7, 23])
def test_ivm_minmax_equals_recompute_under_random_ops(spark, tmp_path, seed):
    """IVM composition fuzz: a seeded random schedule of inserts, updates
    (including group-moving and NULL-valued payloads), and deletes —
    deliberately biased to retract group extremes — rolls a (count, sum,
    min, max) view forward window by window; after EVERY window the
    maintained view must equal the from-scratch recompute.  Covers the
    interleavings the single-scenario tests cannot: extreme retraction +
    group move in one window, a group emptying and reappearing, NULL-only
    groups gaining values, ties on the extreme."""
    from valentine_spark.cdc import (
        apply_batch, init_aggregate, maintain_aggregate,
    )

    rng = random.Random(seed)
    lake = LakeTable.create(str(tmp_path / "ivmf"), spark, n_buckets=4)
    keys = [("r0", f"p{i}", "c") for i in range(40)]
    live = {}  # key -> (lang, content)
    lsn = [0]

    def window(n_ops):
        rows = []
        for _ in range(n_ops):
            lsn[0] += 1
            k = rng.choice(keys)
            if k in live and rng.random() < 0.4:
                rows.append((lsn[0], "delete", *k, None, None))
                live.pop(k, None)
            else:
                lang = rng.choice(LANGS)
                # bias content lengths to collide at the extremes (0 and 12)
                # and include NULLs, so retractions frequently hit the
                # stored min/max and NULL groups occur
                content = rng.choice(
                    [None, "", "x" * 12, "x" * 12, "y" * rng.randint(1, 11)]
                )
                rows.append((lsn[0], "upsert", *k, lang, content))
                live[k] = (lang, content)
        df = spark.createDataFrame(
            rows,
            "lsn long, op string, repo string, path string, "
            "`commit` string, lang string, content string",
        ).withColumn("op_ts", F.lit("2026-01-01 00:00:00").cast("timestamp"))
        return df

    measures = {
        "files": ("count", None),
        "n_content": ("count", "content"),
        "bytes": ("sum", "clen"),
        "min_len": ("min", "clen"),
        "max_len": ("max", "clen"),
    }

    def prep(df):
        out = df.withColumn("clen", F.length(F.col("content")))
        if "_before_content" in df.columns:
            out = out.withColumn("_before_clen", F.length(F.col("_before_content")))
        return out

    apply_batch(lake, window(60), "w0")
    view = init_aggregate(prep(lake.read()), ["lang"], measures).cache()
    view.count()
    for i in range(1, 6):
        v = lake.version
        apply_batch(lake, window(50), f"w{i}")
        chg = prep(lake.changes(v, include_before=True)).persist()
        view = maintain_aggregate(
            view, chg, ["lang"], measures, base=prep(lake.read())
        ).cache()
        view.count()
        chg.unpersist()
        got = sorted(map(tuple, view.collect()))
        want = sorted(map(tuple, init_aggregate(prep(lake.read()), ["lang"], measures).collect()))
        assert got == want, f"seed={seed} window={i}"
