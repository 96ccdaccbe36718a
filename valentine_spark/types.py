"""The 4-type lattice {int, float, varchar, date} shared by all matchers.

The reference coarsens pandas dtypes via ``BaseTable.get_data_type``
(``/root/reference/valentine/data_sources/base_table.py:47-65``): object
columns are sniffed as dates from their first value, int*/float* map to
int/float, everything else is varchar.  Here the primary source of truth is
the Spark ``StructType`` — no sniffing needed for typed columns; only string
columns get a first-value date sniff (cheap, driver-side, on a 1-row sample).
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_DATE_FORMATS = (
    "%Y-%m-%d", "%Y/%m/%d", "%d-%m-%Y", "%d/%m/%Y", "%m/%d/%Y",
    "%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%d %b %Y", "%b %d %Y",
    "%d %B %Y", "%B %d %Y", "%Y%m%d",
)
_YEARISH = re.compile(r"^\d{4}$")


def is_date(value) -> bool:
    """Lightweight stand-in for the reference's dateutil sniff
    (``data_sources/utils.py:32-42``): strptime over common formats, plus
    bare 4-digit years (dateutil parses those as dates too).

    KNOWN NARROWER than dateutil: bare 1-2 digit numbers ('12'), bare
    month names ('May'), and times of day ('12:30') parse as dates under
    dateutil but return False here — deliberate, those sniffs misclassify
    far more real varchar columns than they correctly type; the divergence
    only matters for columns whose first value is such a fragment."""
    if isinstance(value, (_dt.date, _dt.datetime)):
        return True
    s = str(value).strip()
    if _YEARISH.match(s):
        return True
    for fmt in _DATE_FORMATS:
        try:
            _dt.datetime.strptime(s, fmt)
            return True
        except ValueError:
            continue
    try:
        _dt.datetime.fromisoformat(s)
        return True
    except ValueError:
        return False


def convert_data_type(value: str):
    """string -> int -> float fallback, mirroring reference
    ``utils/utils.py:15-22`` (used for rank-corpus normalization)."""
    try:
        f = float(value)
    except (TypeError, ValueError):
        return value
    if f.is_integer():
        return int(f)
    return f


def lattice_type_of(spark_type: T.DataType, sample: Optional[str] = None) -> str:
    """Coarsen a Spark type to the reference lattice."""
    if isinstance(spark_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(spark_type, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(spark_type, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "date"
    if isinstance(spark_type, T.BooleanType):
        # the reference's get_data_type leaves bool dtypes UNTYPED (its
        # branch chain covers only object/int*/float*, so new_d_type stays
        # "") — Cupid's compatibility then falls back to name-token
        # similarity.  Coarsening to 'int' would instead grant bool~int
        # compat 1.0, changing the match set vs the pinned reference.
        return ""
    if sample is not None and is_date(sample):
        return "date"
    return "varchar"


def lattice_types(df: DataFrame, sniff_dates: bool = True) -> dict:
    """Map every column of ``df`` to its lattice type.  String columns are
    date-sniffed from a PER-COLUMN non-null sample — F.min per column in
    one tiny agg job.  (A single shared sample row would leave any column
    null in that row unsniffed, and an unordered limit(1) is
    nondeterministic across runs; min is deterministic and skips nulls —
    the reference sniffs each column's first non-null value, which for
    homogeneous columns types identically.)"""
    samples: dict = {}
    if sniff_dates:
        str_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)]
        if str_cols:
            from pyspark.sql import functions as F

            row = df.agg(*[F.min(F.col(c)).alias(c) for c in str_cols]).collect()[0]
            samples = {c: row[c] for c in str_cols if row[c] is not None}
    return {
        f.name: lattice_type_of(f.dataType, samples.get(f.name))
        for f in df.schema.fields
    }
