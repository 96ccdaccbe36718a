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
derives as sum/count at read.  ``min``/``max`` are NOT self-maintainable
under deletes (a retracted extreme needs a rescan of its group), so they
are maintained by the standard selective-rescan technique (Materialize /
Flink retractable-extreme style): inserts merge monotonically
(``least``/``greatest``), and ONLY groups where a retracted value ties the
stored extreme are re-aggregated from the post-window base state —
``maintain_aggregate(..., base=...)``.  Cost scales with the churned
groups' row count, never the table; the adversarial worst case (every
window deletes every group's current extreme) degrades to a rescan of all
touched groups, which is still the from-scratch cost only for those
groups.

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


def _split_measures(measures: Dict[str, Tuple[str, Optional[str]]]):
    """(count/sum measures, min/max measures) — with validation."""
    cs: Dict[str, Tuple[str, Optional[str]]] = {}
    mm: Dict[str, Tuple[str, str]] = {}
    for out, (agg, col) in measures.items():
        if agg in ("count", "sum"):
            if agg == "sum" and not col:
                raise ValueError(f"measure {out!r}: sum needs a source column")
            cs[out] = (agg, col)
        elif agg in ("min", "max"):
            if not col:
                raise ValueError(f"measure {out!r}: {agg} needs a source column")
            mm[out] = (agg, col)
        else:
            raise ValueError(
                f"measure {out!r}: supported aggregates are count/sum/min/max, got {agg!r}"
            )
    return cs, mm


def _measure_exprs(measures: Dict[str, Tuple[str, Optional[str]]]):
    cs, mm = _split_measures(measures)
    if mm:
        raise ValueError(
            f"measures {sorted(mm)} are min/max — not expressible as a pure "
            "delta; use maintain_aggregate(..., base=...) which handles them "
            "via selective group rescan"
        )
    for out, (agg, col) in cs.items():
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
            # SQL count semantics: count(col) weighs only non-NULL values,
            # count(*) (col=None) weighs every row
            w = (
                F.lit(sign).cast("long")
                if col is None
                else F.lit(sign) * _src(col).isNotNull().cast("long")
            )
            cols.append(w.cast("long").alias(out))
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

    ``measures`` maps output column -> ("count", None) for ``count(*)``,
    ("count", src_col) for SQL ``count(col)`` (non-NULL only), or
    ("sum", src_col).
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
    cs, mm = _split_measures(measures)
    aggs = [F.count(F.lit(1)).alias(_GROUP_N)]
    for out, (agg, col) in cs.items():
        if agg == "count":
            # count(col) = non-NULL values only; count(*) when col is None
            aggs.append(F.count(F.lit(1) if col is None else F.col(col)).alias(out))
        else:
            t = _sum_type(state, col)
            aggs.append(
                F.sum(F.coalesce(F.col(col).cast(t), F.lit(0).cast(t)))
                .cast(t)
                .alias(out)
            )
    for out, (agg, col) in mm.items():
        aggs.append((F.min(col) if agg == "min" else F.max(col)).alias(out))
    return state.groupBy(*group_cols).agg(*aggs)


def maintain_aggregate(
    prev: DataFrame,
    changes: DataFrame,
    group_cols: list,
    measures: Dict[str, Tuple[str, Optional[str]]],
    base: Optional[DataFrame] = None,
) -> DataFrame:
    """Roll a materialized aggregate forward by one changelog window:
    ``prev`` (from ``init_aggregate`` or a prior maintain) + the window's
    net delta, merged with one full-outer join on the group key.  Groups
    whose row count reaches zero are dropped (never emitted as zero rows,
    matching a from-scratch recompute).  Idempotent per window — apply each
    changelog window exactly once, in version order.

    ``min``/``max`` measures additionally require ``base``: the table state
    AFTER the window (e.g. ``lake.read()`` at the window's to-version).
    Inserts merge monotonically; only groups where a retracted before-image
    value reaches the candidate extreme are re-aggregated from ``base`` —
    one semi-join pruned to those groups, cost O(churned groups' rows).

    Cost note: with min/max measures the ``changes`` plan is consulted three
    times (delta, adds, retractions).  When ``changes`` is itself an
    expensive diff (``LakeTable.changes`` is a key-partitioned full-outer
    join), ``.persist()`` it around this call so the diff executes once.
    """
    cs, mm = _split_measures(measures)
    if mm and base is None:
        raise ValueError(
            f"min/max measures {sorted(mm)} need base= (the post-window "
            "table state) for selective group rescans"
        )
    delta = aggregate_delta(changes, group_cols, cs)
    d = delta.select(
        *[F.col(c).alias(f"_d_key_{c}") for c in group_cols],
        F.col(_GROUP_N).alias("_d_n"),
        *[F.col(out).alias(f"_d_{out}") for out in cs],
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
    for out in cs:
        out_cols.append(
            (F.coalesce(prev[out], zero) + F.coalesce(F.col(f"_d_{out}"), zero)).alias(out)
        )
    # previous extremes ride through the merge; resolved below
    out_cols += [prev[out].alias(f"_prev_{out}") for out in mm]
    rolled = merged.select(*out_cols)
    if not mm:
        return rolled.where(F.col(_GROUP_N) > 0)
    return _resolve_minmax(rolled, prev, changes, base, group_cols, mm).where(
        F.col(_GROUP_N) > 0
    )


def _nullsafe_on(left: DataFrame, right: DataFrame, lcols: list, rcols: list):
    cond = None
    for lc, rc in zip(lcols, rcols):
        eq = left[lc].eqNullSafe(right[rc])
        cond = eq if cond is None else (cond & eq)
    return cond


def _resolve_minmax(
    rolled: DataFrame,
    prev: DataFrame,
    changes: DataFrame,
    base: DataFrame,
    group_cols: list,
    mm: Dict[str, Tuple[str, str]],
) -> DataFrame:
    """Attach final min/max columns to the rolled count/sum merge.

    * adds side (NEW images): per-group min/max of inserted values — merges
      into the previous extreme with ``least``/``greatest`` (both skip
      NULLs, matching min/max-over-group semantics);
    * retraction side (BEFORE images): a retraction matters only when it
      reaches the MERGED candidate extreme — ``least/greatest(prev, adds)``,
      not ``prev`` alone: an intra-window insert-then-delete of a brand-new
      group's extreme never touches ``prev`` (and a group whose stored
      extreme is NULL compares UNKNOWN), so comparing against ``prev`` via
      an inner join would silently keep the retracted value.  Groups whose
      per-window retracted min/max ties-or-beats the candidate are
      re-aggregated exactly from ``base``; a retraction strictly worse than
      the candidate cannot change the extreme (the candidate value is
      either still present or itself retracted — in which case IT triggers);
    * a rescanned group's extremes come WHOLLY from the rescan (``base`` is
      post-window, so the window's own inserts are already in it)."""
    before = {c: (f"_before_{c}" if c not in KEY_COLS else c) for c in group_cols}
    for out, (_agg, col) in mm.items():
        b = f"_before_{col}" if col not in KEY_COLS else col
        if b not in changes.columns:
            raise ValueError(
                f"changelog lacks {b!r} — min/max maintenance needs "
                "changes(include_before=True)"
            )
    for c in group_cols:
        if c not in KEY_COLS and before[c] not in changes.columns:
            raise ValueError(
                f"changelog lacks {before[c]!r} — call changes(include_before=True)"
            )

    adds = (
        changes.where(F.col("change_op") != "delete")
        .groupBy(*group_cols)
        .agg(*[
            (F.min(col) if agg == "min" else F.max(col)).alias(f"_add_{out}")
            for out, (agg, col) in mm.items()
        ])
        .select(
            *[F.col(c).alias(f"_a_key_{c}") for c in group_cols],
            *[f"_add_{out}" for out in mm],
        )
    )
    rets = (
        changes.where(F.col("change_op") != "insert")
        .groupBy(*[F.col(before[c]).alias(c) for c in group_cols])
        .agg(*[
            (F.min if agg == "min" else F.max)(
                F.col(f"_before_{col}" if col not in KEY_COLS else col)
            ).alias(f"_ret_{out}")
            for out, (agg, col) in mm.items()
        ])
    )
    # groups whose (possibly) retracted extreme reaches the merged
    # candidate — LEFT joins from the retraction side, so groups absent
    # from prev (created and churned within one window) still trigger
    p = prev.select(
        *[F.col(c).alias(f"_p_key_{c}") for c in group_cols],
        *[F.col(out).alias(f"_p_{out}") for out in mm],
    )
    trig = rets.join(
        p, _nullsafe_on(rets, p, group_cols, [f"_p_key_{c}" for c in group_cols]),
        "left",
    ).join(
        adds,
        _nullsafe_on(rets, adds, group_cols, [f"_a_key_{c}" for c in group_cols]),
        "left",
    )
    hit = None
    for out, (agg, _col) in mm.items():
        cand = (F.least if agg == "min" else F.greatest)(
            F.col(f"_p_{out}"), F.col(f"_add_{out}")
        )
        ret = F.col(f"_ret_{out}")
        # candidate NULL with a non-null retraction cannot arise from a
        # consistent prev, but rescanning is always safe — trigger anyway
        cmp = ret.isNotNull() & (
            cand.isNull() | ((ret <= cand) if agg == "min" else (ret >= cand))
        )
        hit = cmp if hit is None else (hit | cmp)
    triggered = (
        trig.where(hit)
        .select(*[rets[c].alias(f"_t_key_{c}") for c in group_cols])
        .distinct()
    )
    rescan = (
        base.join(
            triggered,
            _nullsafe_on(base, triggered, group_cols,
                         [f"_t_key_{c}" for c in group_cols]),
            "left_semi",
        )
        .groupBy(*group_cols)
        .agg(*[
            (F.min(col) if agg == "min" else F.max(col)).alias(f"_rs_{out}")
            for out, (agg, col) in mm.items()
        ])
        .select(
            *[F.col(c).alias(f"_r_key_{c}") for c in group_cols],
            F.lit(True).alias("_rescanned"),
            *[f"_rs_{out}" for out in mm],
        )
    )
    # emptied-but-triggered groups have no rescan row AND _n == 0 — dropped
    # by the caller's liveness filter either way.  NOTE: a triggered group
    # whose rescan finds only NULL measure values keeps its row with a NULL
    # extreme, exactly like a from-scratch recompute.
    joined = rolled.join(
        adds,
        _nullsafe_on(rolled, adds, group_cols, [f"_a_key_{c}" for c in group_cols]),
        "left",
    ).join(
        rescan,
        _nullsafe_on(rolled, rescan, group_cols, [f"_r_key_{c}" for c in group_cols]),
        "left",
    )
    final = [rolled[c] for c in group_cols] + [rolled[_GROUP_N]]
    keep = [
        c for c in rolled.columns
        if c not in group_cols and c != _GROUP_N and not c.startswith("_prev_")
    ]
    final += [rolled[c] for c in keep]
    for out, (agg, _col) in mm.items():
        merge = (F.least if agg == "min" else F.greatest)(
            F.col(f"_prev_{out}"), F.col(f"_add_{out}")
        )
        final.append(
            F.when(F.coalesce(F.col("_rescanned"), F.lit(False)), F.col(f"_rs_{out}"))
            .otherwise(merge)
            .alias(out)
        )
    return joined.select(*final)
