"""Incremental view maintenance (IVM) over the lake changelog.

The downstream half of a CDC pipeline rarely wants the raw rows — it wants
a *materialized aggregate* (per-repo file counts, per-language byte totals)
kept current without rescanning the table.  Classic delta maintenance does
this from the changelog alone: every change row contributes its NEW values
positively and retracts its BEFORE-image values negatively, so the
per-group delta is one aggregation over the (small) changelog window and
the merge into the materialized state is one key-partitioned outer join —
cost scales with churn, never with table size.  This is the
``GROUP BY``-view half of the standard counting algorithm (Gupta &
Mumick's delta rules; what Materialize/Flink call retraction streams,
DBSP's z-set weights).

Requires the before-image changelog
(``LakeTable.changes(..., include_before=True)``) so that updates which
MOVE a row across groups (the group-by column itself changed) retract from
the old group and add to the new one.

Supported measures: ``count`` and ``sum`` — the self-maintainable
aggregates (each is a group homomorphism, so deltas compose); ``avg``
derives as sum/count at read.  min/max are NOT self-maintainable under
deletes (a retracted max needs a rescan of the group) and are deliberately
absent.

Numeric caveat: float sums maintained incrementally accumulate the usual
reassociation error relative to a from-scratch recompute; integer/decimal
measures are exact (the tests pin integer equality) — integral sources
accumulate in LONG and decimals widen to precision 38 (see ``_sum_type``;
a double accumulator would silently round integer totals past 2^53).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .generator import KEY_COLS

__all__ = ["aggregate_delta", "maintain_aggregate", "init_aggregate"]

_GROUP_N = "_n"  # hidden per-group row count: decides group liveness


def _sum_type(df: DataFrame, col: str):
    """Accumulator type for a sum measure over ``col`` — chosen so the
    docstring's exactness promise actually holds: integral sources sum in
    LONG (exact; ANSI mode raises on the astronomically-unlikely 2^63
    overflow instead of wrapping), decimals widen to precision 38 with
    their own scale (exact), everything else sums in double (the
    documented float reassociation caveat).  A blanket double cast would
    silently round integer totals past 2^53."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return T.LongType()
    if isinstance(dt, T.DecimalType):
        return T.DecimalType(38, dt.scale)
    return T.DoubleType()


def _measure_exprs(measures: Dict[str, Tuple[str, Optional[str]]]):
    for out, (agg, col) in measures.items():
        if agg not in ("count", "sum"):
            raise ValueError(
                f"measure {out!r}: only count/sum are self-maintainable, got {agg!r}"
            )
        if agg == "sum" and not col:
            raise ValueError(f"measure {out!r}: sum needs a source column")
        yield out, agg, col


def _side_contrib(
    changes: DataFrame,
    group_cols: list,
    measures: Dict[str, Tuple[str, Optional[str]]],
    sign: int,
) -> DataFrame:
    """One side of the delta: +1 weights from the NEW image (insert/update),
    -1 weights from the BEFORE image (update/delete)."""
    before = sign < 0

    def _src(col: str) -> F.Column:
        # key columns are immutable per row identity; payload columns come
        # from the before-image on the retraction side
        if before and col not in KEY_COLS:
            b = f"_before_{col}"
            if b not in changes.columns:
                raise ValueError(
                    f"changelog lacks {b!r} — call changes(include_before=True) "
                    "for delta maintenance over payload columns"
                )
            return F.col(b)
        return F.col(col)

    side = changes.where(
        F.col("change_op") != ("insert" if before else "delete")
    )
    cols = [_src(g).alias(g) for g in group_cols]
    cols.append(F.lit(sign).cast("long").alias(_GROUP_N))
    for out, agg, col in _measure_exprs(measures):
        if agg == "count":
            cols.append(F.lit(sign).cast("long").alias(out))
        else:
            t = _sum_type(changes, col)
            cols.append(
                (F.lit(sign) * F.coalesce(_src(col).cast(t), F.lit(0).cast(t)))
                .cast(t)
                .alias(out)
            )
    return side.select(*cols)


def aggregate_delta(
    changes: DataFrame,
    group_cols: list,
    measures: Dict[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """Per-group NET delta of a changelog window: one union + one hash
    aggregation (map-side partial) over the window's rows only.

    ``measures`` maps output column -> ("count", None) | ("sum", src_col).
    The result carries the hidden ``_n`` group-cardinality delta used by
    ``maintain_aggregate`` to drop emptied groups.

    Derived measure/group columns (e.g. a length of a payload column) must
    be added to BOTH images before calling — ``col`` on the new side and
    ``_before_col`` on the retraction side (see the tests / the
    ``cdc_incremental_agg`` driver query for the pattern).
    """
    plus = _side_contrib(changes, group_cols, measures, +1)
    minus = _side_contrib(changes, group_cols, measures, -1)
    u = plus.unionByName(minus)
    aggs = [F.sum(_GROUP_N).alias(_GROUP_N)]
    for out, _, _ in _measure_exprs(measures):
        aggs.append(F.sum(out).alias(out))
    return u.groupBy(*group_cols).agg(*aggs)


def init_aggregate(
    state: DataFrame,
    group_cols: list,
    measures: Dict[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """Materialize the view from a full table state (the bootstrap scan;
    thereafter ``maintain_aggregate`` keeps it current from changelogs)."""
    aggs = [F.count(F.lit(1)).alias(_GROUP_N)]
    for out, agg, col in _measure_exprs(measures):
        if agg == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        else:
            t = _sum_type(state, col)
            aggs.append(
                F.sum(F.coalesce(F.col(col).cast(t), F.lit(0).cast(t)))
                .cast(t)
                .alias(out)
            )
    return state.groupBy(*group_cols).agg(*aggs)


def maintain_aggregate(
    prev: DataFrame,
    changes: DataFrame,
    group_cols: list,
    measures: Dict[str, Tuple[str, Optional[str]]],
) -> DataFrame:
    """Roll a materialized aggregate forward by one changelog window:
    ``prev`` (from ``init_aggregate`` or a prior maintain) + the window's
    net delta, merged with one full-outer join on the group key.  Groups
    whose row count reaches zero are dropped (never emitted as zero rows,
    matching a from-scratch recompute).  Idempotent per window — apply each
    changelog window exactly once, in version order.
    """
    delta = aggregate_delta(changes, group_cols, measures)
    d = delta.select(
        *[F.col(c).alias(f"_d_key_{c}") for c in group_cols],
        F.col(_GROUP_N).alias("_d_n"),
        *[F.col(out).alias(f"_d_{out}") for out in measures],
    )
    # null-SAFE key equality: groupBy treats NULL as one group, so the
    # merge join must too — a plain equi-join would split a NULL-keyed
    # group into two rows that never reconcile
    cond = None
    for c in group_cols:
        eq = prev[c].eqNullSafe(d[f"_d_key_{c}"])
        cond = eq if cond is None else (cond & eq)
    merged = prev.join(d, cond, "full_outer")
    zero = F.lit(0)
    out_cols = [
        F.coalesce(prev[c], d[f"_d_key_{c}"]).alias(c) for c in group_cols
    ]
    out_cols.append(
        (F.coalesce(F.col(_GROUP_N), zero) + F.coalesce(F.col("_d_n"), zero)).alias(_GROUP_N)
    )
    for out, _, _ in _measure_exprs(measures):
        out_cols.append(
            (F.coalesce(F.col(out), zero) + F.coalesce(F.col(f"_d_{out}"), zero)).alias(out)
        )
    return merged.select(*out_cols).where(F.col(_GROUP_N) > 0)
