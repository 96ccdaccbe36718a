"""Micro-batch apply pipeline: LWW dedup -> schema-drift resolution -> MERGE.

Last-writer-wins (north_star): the canonical formulation is
``row_number() OVER (PARTITION BY repo,path,commit ORDER BY op_ts DESC, lsn
DESC) = 1`` (SURVEY.md §2.5 W-new).  The engine's default implementation is a
**salted two-phase max_by reduction** instead: per (key, salt) partial argmax,
then per key final argmax.  It is algebraically identical (the (op_ts, lsn)
order is total — lsn is unique), but:

  * it is a hash aggregation with map-side partial combine — O(n) and no
    per-key sort, vs the window's full sort of every key group;
  * a hot key with millions of updates in one batch splits across
    ``n_salts`` reducers in phase 1; phase 2 sees ``n_salts`` rows per key.
    This is the *explicit* skew defense the north rule demands — AQE is a
    backstop, not the answer.

``lww_dedup_window`` keeps the window formulation for oracle comparison; the
two are asserted equal in tests.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .drift import resolve_drift
from .generator import KEY_COLS, STREAM_COLS
from .lake import LakeTable, bucket_expr

META_COLS = ["lsn", "op_ts", "op"]


def lww_dedup(events: DataFrame, n_salts: int = 16) -> DataFrame:
    """Salted two-phase argmax: one surviving event per key (the latest by
    (op_ts, lsn))."""
    cols = events.columns
    payload = F.struct(*[F.col(c) for c in cols])
    order = F.struct(F.col("op_ts"), F.col("lsn"))
    phase1 = (
        events.withColumn("_salt", F.pmod(F.xxhash64(F.col("lsn")), F.lit(n_salts)))
        .groupBy(*KEY_COLS, "_salt")
        .agg(F.max_by(payload, order).alias("_w"))
    )
    phase2 = phase1.groupBy(*KEY_COLS).agg(
        F.max_by(F.col("_w"), F.struct(F.col("_w.op_ts"), F.col("_w.lsn"))).alias("_w")
    )
    return phase2.select("_w.*")


def lww_dedup_window(events: DataFrame) -> DataFrame:
    """Window formulation (the SQL-oracle shape); used for equivalence tests
    and as the fallback where max_by is unavailable."""
    w = Window.partitionBy(*KEY_COLS).orderBy(F.col("op_ts").desc(), F.col("lsn").desc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def batch_watermarks(events: DataFrame, n_buckets: int) -> Dict[int, int]:
    """Per-bucket max lsn of the batch (the high-watermark checkpoint)."""
    rows = (
        events.withColumn("_b", bucket_expr(n_buckets))
        .groupBy("_b")
        .agg(F.max("lsn").alias("wm"))
        .collect()
    )
    return {int(r["_b"]): int(r["wm"]) for r in rows}


def apply_batch(
    lake: LakeTable,
    events: DataFrame,
    batch_id: str,
    matcher=None,
    n_salts: int = 16,
    drift_threshold: float = 0.5,
) -> dict:
    """Apply one micro-batch exactly-once.  Steps:
      1. skip if batch_id already committed (idempotent re-run);
      2. resolve schema drift (rename via Valentine matcher / evolve);
      3. salted LWW dedup to one op per key;
      4. MERGE (upserts + deletes) with per-bucket watermarks.
    """
    if batch_id in lake.applied_batches():
        return {"batch_id": batch_id, "skipped": True}

    events, drift_map = resolve_drift(events, lake, matcher=matcher, threshold=drift_threshold)

    meta = lake.metadata()
    wms = batch_watermarks(events, meta["n_buckets"])

    winners = lww_dedup(events, n_salts=n_salts)
    schema_cols = [f.name for f in lake.schema.fields]
    upsert_cols = [
        F.col(c) if c in winners.columns else F.lit(None).cast(dict_of_types(lake)[c]).alias(c)
        for c in schema_cols
    ]
    upserts = winners.where(F.col("op") != "delete").select(*upsert_cols)
    deletes = winners.where(F.col("op") == "delete").select(*KEY_COLS)

    lineage: dict = {}
    if drift_map:
        lineage["drift_mapping"] = drift_map
    return lake.merge(upserts, deletes, batch_id, batch_watermarks=wms, lineage=lineage)


def dict_of_types(lake: LakeTable):
    return {f.name: f.dataType for f in lake.schema.fields}


def replay(
    lake: LakeTable,
    stream: DataFrame,
    batch_lsns: int = 1_000_000,
    batch_id_prefix: str = "batch",
    matcher=None,
    n_salts: int = 16,
    max_lsn: Optional[int] = None,
) -> list:
    """Deterministic micro-batch replay over LSN slices — the batch-mode
    equivalent of tailing the stream (resumable, exactly-once).  The slice
    filter pushes down to the stream source scan."""
    if max_lsn is None:
        max_lsn = stream.agg(F.max("lsn")).collect()[0][0]
        if max_lsn is None:
            return []
    commits = []
    n_batches = math.floor(max_lsn / batch_lsns) + 1
    for i in range(n_batches):
        lo, hi = i * batch_lsns, (i + 1) * batch_lsns
        batch = stream.where((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        commits.append(
            apply_batch(lake, batch, f"{batch_id_prefix}-{lo}-{hi}", matcher=matcher, n_salts=n_salts)
        )
    return commits


def resume_replay(
    lake: LakeTable,
    stream: DataFrame,
    batch_lsns: int = 1_000_000,
    batch_id_prefix: str = "batch",
    **kw,
) -> list:
    """Resume from the per-bucket high watermarks: events at or below their
    bucket's watermark are already reflected in table state and are filtered
    out before re-apply; batch ids repeat so already-committed slices are
    skipped by the manifest check as well (two independent guards)."""
    wms = lake.watermarks()
    meta = lake.metadata()
    if wms:
        spark = stream.sparkSession
        wm_df = F.broadcast(
            spark.createDataFrame(
                [(b, lsn) for b, lsn in wms.items()], "_b int, _wm long"
            )
        )
        filtered = (
            stream.withColumn("_b", bucket_expr(meta["n_buckets"]).cast("int"))
            .join(wm_df, "_b", "left")
            .where(F.col("_wm").isNull() | (F.col("lsn") > F.col("_wm")))
            .drop("_b", "_wm")
        )
    else:
        filtered = stream
    return replay(lake, filtered, batch_lsns=batch_lsns, batch_id_prefix=batch_id_prefix, **kw)


def oracle_replay(events_rows, base_rows=None) -> dict:
    """Single-threaded reference replay (tests): returns {key: row_dict} after
    applying events in (op_ts, lsn) order."""
    state = {}
    for row in base_rows or []:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        state[(d["repo"], d["path"], d["commit"])] = d
    ordered = sorted(
        (r.asDict() if hasattr(r, "asDict") else dict(r) for r in events_rows),
        key=lambda d: (d["op_ts"], d["lsn"]),
    )
    for d in ordered:
        key = (d["repo"], d["path"], d["commit"])
        if d["op"] == "delete":
            state.pop(key, None)
        else:
            state[key] = {k: d[k] for k in d if k not in ("lsn", "op_ts", "op")}
    return state
