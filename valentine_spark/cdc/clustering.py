"""Z-order (Morton) multi-column clustering for ``compact`` — the true
bit-interleave behind Delta's ``OPTIMIZE ZORDER BY`` (lexicographic
``sort_cols`` only tightens file bounds for the LEADING column; points
close in Z-value are close in EVERY dimension, so per-file [lo, hi]
bounds stay tight for each clustered column independently and ``scan``
prunes on any of them).

Everything is JVM-side Catalyst expressions — no UDF, no extra shuffle
beyond the rewrite compact already does:

1. each column maps to a 16-bit key:
   * numeric / timestamp — min-max scaled over the rewritten rows (the
     two-value agg is the one extra job, same pass Delta's OPTIMIZE
     makes to compute range IDs);
   * string — the two character code points AFTER the longest common
     prefix of the column's (min, max): locality-preserving and robust
     to shared prefixes (a JSON-ish column like ``{"k": ...}`` would key
     to a constant under an absolute prefix; skipping the common run
     keys on the first DISCRIMINATING characters instead — calibrated
     from the same min/max agg the numeric path runs);
   * NULLs key to 0 (cluster together at the origin);
2. the keys' bits are interleaved LSB-first into one long
   (``x0 y0 x1 y1 ...``), built from shift/and/or expressions that
   whole-stage codegen flattens.

Supports 2-4 columns (1 would be a plain sort; beyond 4 each dimension
keeps 16 bits but file counts rarely justify it — same practical limit
Delta documents).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["zorder_column"]

_KEY_BITS = 16
_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _common_prefix_len(a: str, b: str) -> int:
    n = 0
    for x, y in zip(a or "", b or ""):
        if x != y:
            break
        n += 1
    return n


def _as_numeric(col: str, dtype: T.DataType) -> Column:
    """Monotone numeric image of an orderable column (Spark's ANSI caster
    rejects DATE/TIMESTAMP -> DOUBLE, so temporals go through their epoch
    counters)."""
    c = F.col(col)
    if isinstance(dtype, T.DateType):
        return F.datediff(c, F.lit("1970-01-01")).cast("double")
    if isinstance(dtype, T.TimestampType):
        return (F.unix_micros(c)).cast("double")
    if isinstance(dtype, T.TimestampNTZType):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    return c.cast("double")


def _key16(
    col: str,
    dtype: T.DataType,
    bounds: Dict[str, Tuple[float, float]],
    str_skip: Dict[str, int],
    key_bits: int,
) -> Column:
    c = F.col(col)
    top = (1 << key_bits) - 1
    if isinstance(dtype, T.StringType):
        skip = str_skip.get(col, 0)
        first = F.coalesce(F.ascii(F.substring(c, skip + 1, 1)), F.lit(0))
        second = F.coalesce(F.ascii(F.substring(c, skip + 2, 1)), F.lit(0))
        # code points can exceed 255 (non-latin); clamp into the byte lanes,
        # then shift the 16-bit prefix key down to key_bits
        k16 = F.least(first, F.lit(255)) * 256 + F.least(second, F.lit(255))
        return F.shiftright(k16.cast("long"), 16 - key_bits)
    if isinstance(
        dtype, _NUMERIC + (T.TimestampType, T.TimestampNTZType, T.DateType)
    ):
        mn, mx = bounds[col]
        if mx <= mn:  # constant column: every row keys to 0
            return F.lit(0)
        num = _as_numeric(col, dtype)
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            # non-finite rows would poison the scale math (NaN propagates;
            # ANSI cast of NaN/inf to long raises): NaN sorts greatest in
            # Spark -> key to the top bound; ±inf clamp to the finite
            # calibration bounds.  NULL must stay NULL through the clamp
            # (least/greatest SKIP nulls, so an unguarded clamp would turn
            # NULL into mx) — the coalesce below keys nulls to 0
            num = (
                F.when(num.isNull(), F.lit(None).cast("double"))
                .when(F.isnan(num), F.lit(float(mx)))
                .otherwise(F.greatest(F.lit(float(mn)), F.least(num, F.lit(float(mx)))))
            )
        scaled = (num - F.lit(float(mn))) / F.lit(float(mx - mn))
        # NULLs must key to 0 BEFORE the clamp: Spark's least/greatest skip
        # nulls, so least(NULL, top) = top — a trailing coalesce never
        # fires and every null row would key to the far corner instead of
        # clustering at the origin as documented
        key = F.coalesce(F.floor(scaled * top).cast("long"), F.lit(0))
        return F.greatest(F.lit(0), F.least(key, F.lit(top)))
    if isinstance(dtype, T.BooleanType):
        return F.coalesce(c.cast("int") * top, F.lit(0))
    raise TypeError(f"z-order does not support column {col!r} of type {dtype}")


def zorder_column(df: DataFrame, cols: List[str], schema: T.StructType) -> Column:
    """One long-typed Morton code over ``cols`` for each row of ``df``.
    Runs ONE calibration aggregation over all listed columns: (min, max)
    per numeric/temporal column for range scaling, plus (min, max) per
    string column to compute the common-prefix skip — a single Spark job
    regardless of the column mix."""
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"z-order needs 2-4 columns, got {len(cols)}")
    names = {f.name for f in schema.fields}
    supported = (
        (T.StringType, T.BooleanType)
        + _NUMERIC
        + (T.TimestampType, T.TimestampNTZType, T.DateType)
    )
    for c in cols:
        if c not in names:
            raise KeyError(f"z-order column {c!r} not in table schema {sorted(names)}")
        if not isinstance(schema[c].dataType, supported):
            # fail here with a clear message, not as a DATATYPE_MISMATCH
            # from deep inside the calibration agg's cast-to-double
            raise TypeError(
                f"z-order does not support column {c!r} of type {schema[c].dataType}"
            )
    numeric = [
        c for c in cols
        if not isinstance(schema[c].dataType, (T.StringType, T.BooleanType))
    ]
    strings = [c for c in cols if isinstance(schema[c].dataType, T.StringType)]
    bounds: Dict[str, Tuple[float, float]] = {}
    str_skip: Dict[str, int] = {}
    def _calib(c: str) -> Column:
        # calibrate on FINITE values only: one NaN (sorts greatest) or inf
        # as the max would collapse every row's key for this dimension
        e = _as_numeric(c, schema[c].dataType)
        if isinstance(schema[c].dataType, (T.FloatType, T.DoubleType)):
            e = F.when((e > F.lit(float("-inf"))) & (e < F.lit(float("inf"))), e)
        return e

    if numeric or strings:
        row = df.agg(
            *[F.min(_calib(c)).alias(f"mn_{c}") for c in numeric],
            *[F.max(_calib(c)).alias(f"mx_{c}") for c in numeric],
            *[F.min(F.col(c)).alias(f"smn_{c}") for c in strings],
            *[F.max(F.col(c)).alias(f"smx_{c}") for c in strings],
        ).collect()[0]
        for c in numeric:
            mn, mx = row[f"mn_{c}"], row[f"mx_{c}"]
            bounds[c] = (mn if mn is not None else 0.0, mx if mx is not None else 0.0)
        for c in strings:
            str_skip[c] = _common_prefix_len(row[f"smn_{c}"], row[f"smx_{c}"])
    k = len(cols)
    # keep the interleaved code out of the long's sign bit: at k=4 a full
    # 16-bit key would place the last column's top bit at bit 63 and the
    # signed sort would split that dimension's keyspace (files at the wrap
    # get wide bounds).  15 bits x 4 = 60 keeps the code non-negative.
    key_bits = _KEY_BITS if k * _KEY_BITS < 64 else 15
    keys = [
        _key16(c, schema[c].dataType, bounds, str_skip, key_bits).cast("long")
        for c in cols
    ]
    z = F.lit(0).cast("long")
    for bit in range(key_bits):
        for j, key in enumerate(keys):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(key, bit).bitwiseAND(F.lit(1)), bit * k + j
                )
            )
    return z
