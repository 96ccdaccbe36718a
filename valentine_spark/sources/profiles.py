"""Column-profile substrate: wide table -> long (table, column, value) DataFrame.

This is the shared input of every instance-based matcher (SURVEY.md §1.2): the
reference explodes a pandas frame into per-column Python lists with NaNs
dropped (``dataframe_table.py:37-41``); we unpivot the whole table in ONE scan
(Spark ``unpivot`` → a single ``Expand`` over the row batch, no per-column
re-read) and drop nulls with a filter that stays inside whole-stage codegen.

Scale notes: the profile is (n_rows x n_cols) long-format rows.  Downstream
consumers aggregate it immediately (distinct / histogram / rank), so the wide
row explosion never shuffles raw — only per-column aggregates do.  Profile
DataFrames are cached by callers that reuse them across matcher phases.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..types import lattice_types

TABLE_COL = "table_name"
COLUMN_COL = "column_name"
VALUE_COL = "value"


def profile_table(
    df: DataFrame,
    table_name: str,
    columns: Optional[List[str]] = None,
) -> DataFrame:
    """Unpivot ``df`` into (table_name, column_name, value:string, value_num:double).

    ``value`` is the string image of the cell (matching the reference's
    ``str(x)`` comparisons in jaccard_distance.py:87,184); ``value_num`` is a
    best-effort numeric cast used by rank/ histogram kernels for numeric-aware
    ordering (reference ``convert_data_type``, utils/utils.py:15-22).
    """
    cols = columns if columns is not None else df.columns
    # Normalize every column to string in the unpivot's value expression.
    # Dates stringify deterministically; floats keep Spark's
    # double-to-string form which matches str(float) for typical values.
    # Booleans need the Python render ('True'/'False') — Spark's cast says
    # 'true'/'false', which would zero the Jaccard overlap against the
    # reference's str(x) profile of the same column.
    from pyspark.sql import types as T

    def _as_str(c: str):
        if isinstance(df.schema[c].dataType, T.BooleanType):
            return (
                F.when(F.col(c), F.lit("True"))
                .when(~F.col(c), F.lit("False"))
                .alias(c)
            )
        return F.col(c).cast("string").alias(c)

    selected = df.select([_as_str(c) for c in cols])
    long_df = selected.unpivot([], cols, COLUMN_COL, VALUE_COL)
    return (
        long_df.where(F.col(VALUE_COL).isNotNull())
        .withColumn(TABLE_COL, F.lit(table_name))
        .withColumn("value_num", F.expr(f"try_cast({VALUE_COL} as double)"))
        .select(TABLE_COL, COLUMN_COL, VALUE_COL, "value_num")
    )


def profile_pair(df1: DataFrame, name1: str, df2: DataFrame, name2: str) -> DataFrame:
    """Union profile of both tables — the rank corpus input (SURVEY.md A2/SO1)."""
    return profile_table(df1, name1).unionByName(profile_table(df2, name2))


def column_lattice(df: DataFrame) -> Dict[str, str]:
    return lattice_types(df)


def non_empty_columns(profile: DataFrame) -> List[tuple]:
    """(table_name, column_name) pairs that have at least one non-null value —
    the empty-column filter (reference clustering_utils.py:224-226)."""
    rows = (
        profile.select(TABLE_COL, COLUMN_COL)
        .distinct()
        .collect()
    )
    return sorted((r[TABLE_COL], r[COLUMN_COL]) for r in rows)


def as_spark(df, spark: Optional[SparkSession] = None) -> DataFrame:
    """Accept a pandas or Spark DataFrame at the API edge."""
    if isinstance(df, DataFrame):
        return df
    spark = spark or SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    return spark.createDataFrame(df)
