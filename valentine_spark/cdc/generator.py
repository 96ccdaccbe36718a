"""Deterministic synthetic source-repository table + CDC change stream.

Everything is generated JVM-side from ``spark.range`` + hash expressions —
zero Python in the data plane, so benchmarks measure the ingest pipeline, not
the generator.  Determinism: every field is a pure function of (seed, id), so
the same (seed, sizes) always produce byte-identical data at any parallelism.

Shapes (BASELINE.json input_hint / FIXTURES.md §2):
  base:   repo:string, path:string, commit:string, lang:string, content:string
  stream: lsn:long, op_ts:timestamp, op:string(insert|update|delete),
          repo, path, commit, lang, content (payload null for delete)

Skew: ``hot_fraction`` of all events hit ``n_hot`` "hot" repos (monorepo
pattern) — the explicit-salting test bed required by the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

LANGS = "python java go rust cpp typescript ruby scala".split()

KEY_COLS = ["repo", "path", "commit"]
PAYLOAD_COLS = ["lang", "content"]
STREAM_COLS = ["lsn", "op_ts", "op", *KEY_COLS, *PAYLOAD_COLS]


def _h(seed: int, *cols: Column) -> Column:
    """Deterministic 64-bit mix of seed + columns (xxhash64 is seed-stable
    across Spark partitionings)."""
    return F.xxhash64(F.lit(seed), *cols)


def _pmod(col: Column, n: int) -> Column:
    return F.pmod(col, F.lit(n))


def _repo_expr(seed: int, key_id: Column, n_repos: int, n_hot: int, hot_fraction: float) -> Column:
    """Zipf-ish repo assignment: ``hot_fraction`` of keys collapse onto
    ``n_hot`` repos, the rest spread uniformly."""
    r = _pmod(_h(seed ^ 0x5EED, key_id), 10_000)
    hot_id = _pmod(_h(seed ^ 0x40, key_id), max(n_hot, 1))
    cold_id = _pmod(_h(seed ^ 0xC0, key_id), max(n_repos - n_hot, 1)) + n_hot
    chosen = F.when(r < int(hot_fraction * 10_000), hot_id).otherwise(cold_id)
    return F.concat(F.lit("org"), _pmod(chosen, 97), F.lit("/repo"), chosen)


def _content_expr(seed: int, key_id: Column, version: Column) -> Column:
    """Deterministic pseudo-source text (~200-500 chars), built from hashed
    tokens entirely in JVM expressions."""
    h1 = _h(seed ^ 1, key_id, version)
    h2 = _h(seed ^ 2, key_id, version)
    body = F.concat(
        F.lit("def fn_"), F.abs(h1) % 100000, F.lit("(x):\n"),
        F.lit("    return x * "), F.abs(h2) % 997, F.lit(" + "), F.abs(h1) % 31, F.lit("\n"),
    )
    filler = F.repeat(
        F.concat(F.lit("# "), F.hex(h2), F.lit("\n")),
        (F.abs(h1) % 16).cast("int") + 4,
    )
    return F.concat(body, filler)


def synth_base_table(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_repos: int = 500,
    n_hot: int = 3,
    hot_fraction: float = 0.5,
) -> DataFrame:
    """The initial snapshot: one row per (repo, path, commit) key."""
    ids = spark.range(n_rows).withColumnRenamed("id", "key_id")
    key_id = F.col("key_id")
    return ids.select(
        _repo_expr(seed, key_id, n_repos, n_hot, hot_fraction).alias("repo"),
        F.concat(
            F.lit("src/dir"), _pmod(_h(seed ^ 3, key_id), 50),
            F.lit("/file_"), key_id, F.lit(".py"),
        ).alias("path"),
        F.lpad(F.conv(F.abs(_h(seed ^ 4, key_id, F.lit(0))).cast("string"), 10, 16), 40, "0").alias("commit"),
        F.element_at(F.array(*[F.lit(l) for l in LANGS]), (_pmod(_h(seed ^ 5, key_id), len(LANGS)) + 1).cast("int")).alias("lang"),
        _content_expr(seed, key_id, F.lit(0)).alias("content"),
    )


def change_op_expr(seed: int, lsn: Column, delete_fraction: float = 0.05) -> Column:
    """The op roll (delete / insert / update) for one change event — shared
    by the batch generator below and the rate-source stream
    (``streaming.stream.synth_rate_stream``) so the op mix has ONE source
    of truth; 30% of non-delete events are inserts."""
    op_roll = _pmod(_h(seed ^ 8, lsn), 10_000)
    del_cut = int(delete_fraction * 10_000)
    return (
        F.when(op_roll < del_cut, F.lit("delete"))
        .when(op_roll < del_cut + 3000, F.lit("insert"))
        .otherwise(F.lit("update"))
    )


def change_payload_cols(
    seed: int,
    key_id: Column,
    lsn: Column,
    op: Column,
    n_repos: int = 500,
    n_hot: int = 3,
    hot_fraction: float = 0.5,
) -> list:
    """The five payload columns (repo, path, commit, lang, content) of one
    change event, derived deterministically from (key_id, lsn) — the single
    definition both the batch generator and the rate-source stream project,
    so the two streams can never silently drift apart.  Content varies per
    touch via a (key, lsn) version hash; deletes carry NULL payload."""
    version = _pmod(_h(seed ^ 7, key_id, lsn), 1_000_000)
    is_delete = op == "delete"
    return [
        _repo_expr(seed, key_id, n_repos, n_hot, hot_fraction).alias("repo"),
        F.concat(
            F.lit("src/dir"), _pmod(_h(seed ^ 3, key_id), 50),
            F.lit("/file_"), key_id, F.lit(".py"),
        ).alias("path"),
        F.lpad(
            F.conv(F.abs(_h(seed ^ 4, key_id, F.lit(0))).cast("string"), 10, 16),
            40, "0",
        ).alias("commit"),
        F.when(is_delete, F.lit(None).cast("string"))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(l) for l in LANGS]),
                (_pmod(_h(seed ^ 5, key_id), len(LANGS)) + 1).cast("int"),
            )
        )
        .alias("lang"),
        F.when(is_delete, F.lit(None).cast("string"))
        .otherwise(_content_expr(seed, key_id, version))
        .alias("content"),
    ]


def synth_change_stream(
    spark: SparkSession,
    n_events: int,
    n_keys: int,
    seed: int = 42,
    n_repos: int = 500,
    n_hot: int = 3,
    hot_fraction: float = 0.5,
    delete_fraction: float = 0.05,
    start_lsn: int = 0,
    t0: str = "2026-01-01 00:00:00",
    hot_key_fraction: float = 0.0,
) -> DataFrame:
    """An ordered change stream over ``n_keys`` logical keys.  lsn is dense
    and strictly increasing; op_ts is monotone non-decreasing (1s per 1000
    lsn) so ties exercise the lsn tie-break of the LWW window.

    ``hot_key_fraction``: that fraction of ALL events hit key 0 — the
    single-hot-key pathology used by the skew benchmarks (distinct from
    ``hot_fraction`` which concentrates REPOS, not keys)."""
    ev = spark.range(n_events).select((F.col("id") + start_lsn).alias("lsn"))
    lsn = F.col("lsn")
    key_id = _pmod(_h(seed ^ 6, lsn), n_keys)
    if hot_key_fraction > 0:
        hot_roll = _pmod(_h(seed ^ 9, lsn), 10_000)
        key_id = F.when(hot_roll < int(hot_key_fraction * 10_000), F.lit(0)).otherwise(key_id)
    op = change_op_expr(seed, lsn, delete_fraction)
    return ev.select(
        lsn,
        (F.to_timestamp(F.lit(t0)) + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), (lsn / 1000).cast("int").cast("double"))).alias("op_ts"),
        op.alias("op"),
        *change_payload_cols(seed, key_id, lsn, op, n_repos, n_hot, hot_fraction),
    )
