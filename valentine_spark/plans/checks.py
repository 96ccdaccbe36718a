"""Physical-plan introspection: assert that the plans we ship are the plans
we designed — filters reach the parquet scan, projections prune columns,
small dims broadcast, aggregations partial-combine.  Used by the plan-audit
tests and for BENCH/PLANS.md evidence."""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> List[str]:
    """PushedFilters entries of every scan in the plan."""
    text = explain_str(df)
    out: List[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def scan_columns(df: DataFrame) -> List[List[str]]:
    """ReadSchema column lists of each scan — verifies column pruning."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    text = explain_str(df)
    return "partial_" in text or "HashAggregate" in text and "Partial" in text
