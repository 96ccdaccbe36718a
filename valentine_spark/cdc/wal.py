"""WAL/binlog envelope decoders — the engine's front door.

Real CDC streams do not arrive as clean DataFrames: a binlog tail delivers
JSON envelopes (Debezium's ``{before, after, op, ts_ms, source:{lsn}}``,
Maxwell's ``{type, data, old, ts, position}``).  These decoders turn a
DataFrame holding one raw-JSON column into the canonical change stream
(``STREAM_COLS``: lsn, op_ts, op, key…, payload…) ready for
``apply.apply_batch``, plus a dead-letter quarantine of every event that
cannot be decoded — the ingest contract a production pipeline needs: a
malformed envelope must never abort the batch NOR be silently dropped.

Reference semantics grounding: the reference (delftdata/valentine) consumes
already-tabular inputs (``valentine/data_sources/base_table.py``); the
envelope front door is new construction required by the CDC north star
("tails a binlog/WAL-style change stream").  Envelope shapes follow the
published Debezium and Maxwell wire formats (public documentation), not any
internal system.

Scale notes (100 TB):
  * the entire decode is JVM expressions — one ``from_json`` + struct field
    projections inside a single WholeStageCodegen stage; zero Python in the
    data plane and zero shuffles (quarantine split is two filters over the
    same narrow plan);
  * the parsed struct column is computed ONCE and both outputs (stream,
    dead letters) project from it, so a source that is expensive to re-read
    should be ``.persist()``-ed by the caller if it materializes both sides
    in separate actions — each side alone is one pass;
  * quarantine reasons are a deterministic first-match cascade, so DLQ
    counts are reproducible and monitorable as metrics.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from .generator import KEY_COLS

#: Debezium op → canonical op.  c=create, r=snapshot read, u=update all
#: become "upsert" (LWW+MERGE treats them identically); d=delete.
DEBEZIUM_OPS = {"c": "upsert", "r": "upsert", "u": "upsert", "d": "delete"}

#: Maxwell type → canonical op.  "bootstrap-insert" is Maxwell's snapshot
#: row (Debezium's "r").
MAXWELL_OPS = {
    "insert": "upsert",
    "update": "upsert",
    "bootstrap-insert": "upsert",
    "delete": "delete",
}


class DecodedStream(NamedTuple):
    """Result of an envelope decode: the canonical stream and the dead
    letters.  ``dead_letters`` has columns (raw json string, reason)."""

    stream: DataFrame
    dead_letters: DataFrame


#: Field name reserved for Spark's columnNameOfCorruptRecord inside the
#: parsed envelope.  "Did this record fail to parse?" MUST come from the
#: parser's own corrupt-record flag, not from "are all fields null":
#: Spark's JSON partial-results mode (spark.sql.json.enablePartialResults,
#: default on since 3.4) salvages the prefix fields of a truncated record,
#: and Catalyst's JSON schema pruning turns each struct-field access into
#: its own pruned from_json instance — so an all-null heuristic is both
#: wrong (salvaged op passes it) and plan-dependent (different pruned
#: instances salvage differently).  The corrupt flag is set by the parser
#: whenever tokenization/conversion failed, deterministically per record.
CORRUPT_COL = "_corrupt_record"


def debezium_envelope_schema(payload_schema: StructType) -> StructType:
    """The Debezium wire envelope for a row type: before/after images, op
    code, commit timestamp (ms), and the source block carrying the LSN."""
    return StructType(
        [
            StructField("before", payload_schema),
            StructField("after", payload_schema),
            StructField("op", StringType()),
            StructField("ts_ms", LongType()),
            StructField("source", StructType([StructField("lsn", LongType())])),
        ]
    )


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def maxwell_envelope_schema(payload_schema: StructType) -> StructType:
    """The Maxwell wire envelope: row image in ``data`` (full row, even for
    deletes), changed-columns-only ``old``, epoch-seconds ``ts``, and the
    binlog ``position`` string ("mysql-bin.000007:12345")."""
    return StructType(
        [
            StructField("database", StringType()),
            StructField("table", StringType()),
            StructField("type", StringType()),
            StructField("ts", LongType()),
            StructField("xid", LongType()),
            StructField("position", StringType()),
            StructField("data", payload_schema),
            StructField("old", payload_schema),
        ]
    )


def _first_match_reason(checks: List[tuple]) -> Column:
    """Deterministic first-match quarantine reason (None = healthy)."""
    expr = F.lit(None).cast("string")
    for cond, reason in reversed(checks):
        expr = F.when(cond, F.lit(reason)).otherwise(expr)
    return expr


def _canon_op_expr(op_col: Column, mapping: dict) -> Column:
    """Raw envelope op → canonical op, driven by the mapping dict so it is
    the single source of truth: extending DEBEZIUM_OPS / MAXWELL_OPS (e.g.
    a truncate op) changes both the unknown_op gate and this projection —
    no second hardcoded copy to forget.  Unmapped ops yield NULL, which is
    unreachable on the healthy stream (the unknown_op quarantine fires
    first)."""
    expr: Optional[Column] = None
    for raw_op, canon in mapping.items():
        branch = F.when(op_col == raw_op, F.lit(canon))
        expr = branch if expr is None else expr.when(op_col == raw_op, F.lit(canon))
    return expr


def _canonical(
    parsed: DataFrame,
    json_col: str,
    reason: Column,
    lsn: Column,
    op_ts: Column,
    op: Column,
    image: Column,
    payload_schema: StructType,
) -> DecodedStream:
    """Split a parsed envelope frame into (canonical stream, dead letters).

    Both outputs are narrow projections of the same plan — no shuffle, no
    join; Catalyst prunes the unused envelope branches from each side."""
    tagged = parsed.select(
        F.col(json_col).alias("_raw"),
        reason.alias("_reason"),
        lsn.alias("lsn"),
        op_ts.alias("op_ts"),
        op.alias("op"),
        image.alias("_img"),
    )
    stream = tagged.where(F.col("_reason").isNull()).select(
        "lsn",
        "op_ts",
        "op",
        *[F.col(f"_img.{f.name}").alias(f.name) for f in payload_schema.fields],
    )
    dead = tagged.where(F.col("_reason").isNotNull()).select(
        F.col("_raw").alias("raw"), F.col("_reason").alias("reason")
    )
    return DecodedStream(stream, dead)


def decode_debezium(
    raw: DataFrame,
    payload_schema: StructType,
    json_col: str = "value",
    key_cols: Optional[List[str]] = None,
) -> DecodedStream:
    """Decode Debezium JSON envelopes into the canonical change stream.

    Row image: ``after`` for c/r/u, ``before`` for d (Debezium deletes put
    the deleted row in ``before``; the canonical delete only needs its key
    columns, but whatever payload the image carries is passed through).
    ``lsn`` = ``source.lsn``, ``op_ts`` = ``timestamp_millis(ts_ms)``.

    Quarantine cascade (first match): unparseable → missing_op →
    unknown_op → missing_lsn → missing_ts → missing_image → missing_key.
    "Unparseable" covers malformed/truncated JSON, null input, and valid
    JSON of the wrong shape (e.g. a top-level array) — detected via the
    parser's own corrupt-record flag (``CORRUPT_COL``), the only
    classification that is deterministic under Spark's JSON
    partial-results salvaging and per-field-access schema pruning.
    """
    key_cols = key_cols or [c for c in KEY_COLS if c in payload_schema.names]
    env = _with_corrupt(debezium_envelope_schema(payload_schema))
    parsed = raw.withColumn(
        "_env",
        F.from_json(F.col(json_col), env, {"columnNameOfCorruptRecord": CORRUPT_COL}),
    )
    e = F.col("_env")
    op_raw = e["op"]
    canon_op = _canon_op_expr(op_raw, DEBEZIUM_OPS)
    image = F.when(op_raw == "d", e["before"]).otherwise(e["after"])
    unparseable = e.isNull() | e[CORRUPT_COL].isNotNull()
    reason = _first_match_reason(
        [
            (unparseable, "unparseable"),
            (op_raw.isNull(), "missing_op"),
            (~op_raw.isin(*DEBEZIUM_OPS), "unknown_op"),
            (e["source"]["lsn"].isNull(), "missing_lsn"),
            (e["ts_ms"].isNull(), "missing_ts"),
            (image.isNull(), "missing_image"),
        ]
        + [(image[k].isNull(), "missing_key") for k in key_cols]
    )
    return _canonical(
        parsed,
        json_col,
        reason,
        e["source"]["lsn"].cast("long"),
        F.timestamp_millis(e["ts_ms"]),
        canon_op,
        image,
        payload_schema,
    )


def maxwell_position_lsn(position: Column) -> Column:
    """Total-order LSN from a Maxwell binlog position "mysql-bin.000007:12345":
    (binlog file number) * 2^40 + offset.  Binlog order IS (file, offset)
    lexicographic, and a single binlog file is capped at 1 GiB (< 2^40
    bytes) by MySQL's max_binlog_size, so the packed long preserves it."""
    fileno = F.regexp_extract(position, r"\.(\d+):", 1)
    offset = F.regexp_extract(position, r":(\d+)$", 1)
    return F.when(
        (fileno != "") & (offset != ""),
        fileno.cast("long") * F.lit(1 << 40) + offset.cast("long"),
    ).cast("long")


def decode_maxwell(
    raw: DataFrame,
    payload_schema: StructType,
    json_col: str = "value",
    key_cols: Optional[List[str]] = None,
) -> DecodedStream:
    """Decode Maxwell JSON envelopes into the canonical change stream.

    Row image: ``data`` for every type (Maxwell deletes carry the full
    deleted row in ``data``).  ``op_ts`` = ``timestamp_seconds(ts)``;
    ``lsn`` is packed from the binlog ``position`` string (file number,
    offset) — see ``maxwell_position_lsn``.  Quarantine cascade mirrors
    the Debezium decoder, with "missing_lsn" meaning an absent or
    unparseable ``position``.
    """
    key_cols = key_cols or [c for c in KEY_COLS if c in payload_schema.names]
    env = _with_corrupt(maxwell_envelope_schema(payload_schema))
    parsed = raw.withColumn(
        "_env",
        F.from_json(F.col(json_col), env, {"columnNameOfCorruptRecord": CORRUPT_COL}),
    )
    e = F.col("_env")
    typ = e["type"]
    lsn = maxwell_position_lsn(e["position"])
    canon_op = _canon_op_expr(typ, MAXWELL_OPS)
    image = e["data"]
    unparseable = e.isNull() | e[CORRUPT_COL].isNotNull()
    reason = _first_match_reason(
        [
            (unparseable, "unparseable"),
            (typ.isNull(), "missing_op"),
            (~typ.isin(*MAXWELL_OPS), "unknown_op"),
            (lsn.isNull(), "missing_lsn"),
            (e["ts"].isNull(), "missing_ts"),
            (image.isNull(), "missing_image"),
        ]
        + [(image[k].isNull(), "missing_key") for k in key_cols]
    )
    return _canonical(
        parsed,
        json_col,
        reason,
        lsn,
        F.timestamp_seconds(e["ts"]),
        canon_op,
        image,
        payload_schema,
    )
