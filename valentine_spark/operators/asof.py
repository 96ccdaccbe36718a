"""As-of (point-in-time) join — new construction; the reference has no
temporal joins (SURVEY.md §2.3 note: "as-of/apply-ordered join ... none
present in the reference; to be built new").

``asof_join(left, right, on, ...)`` attaches, to every left row, the most
recent right row of the same key whose timestamp is at-or-before the left
row's timestamp (the semantics of pandas ``merge_asof`` / DuckDB
``ASOF LEFT JOIN`` with ``right.ts <= left.ts``).

Spark-first formulation — union + running ``last`` window, NOT a range join:

  * both sides are tagged and unioned, then a single window per key ordered
    by (timestamp, side) carries the latest right-side payload forward onto
    each left row (``last(_r, ignorenulls=True)`` over unbounded-preceding);
  * ONE shuffle on the join key, cost O(n log n_partition) for the per-key
    sort — no quadratic candidate explosion, unlike the naive
    ``left.ts >= right.ts`` theta-join whose candidate set is O(|L|x|R|)
    per key before taking the max;
  * hot keys behave like any window hot key (bounded by per-key volume, and
    the payload struct is carried, not recomputed); at 100 TB the shuffle is
    the only scale cost and it is the same shuffle a MERGE/LWW already pays;
  * right rows at equal (key, timestamp) resolve deterministically to the
    max payload struct (ties ordered by the struct itself).

Tie semantics: a right row with timestamp EQUAL to the left row's counts as
"before" (inclusive), matching DuckDB ``ON r.ts <= l.ts`` — the right side
of the union sorts before the left side at equal timestamps.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

_SIDE = "_asof_is_left"
_TS = "_asof_t"
_PAYLOAD = "_asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_on: str = "ts",
    right_on: Optional[str] = None,
    right_cols: Optional[List[str]] = None,
    suffix: str = "_matched",
    tolerance_seconds: Optional[float] = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` direction semantics.  Unmatched
    left rows keep nulls (left-join semantics).

    ``direction``:
      * ``backward`` (default) — latest right row with ``right_on <=
        left_on``; duplicate (key, ts) right rows resolve to the MAX
        payload struct;
      * ``forward`` — earliest right row with ``right_on >= left_on``;
        duplicate rows resolve to the MIN payload struct (the first in
        ascending frame order);
      * ``nearest`` — whichever of the two is temporally closer; exact
        ties prefer the backward match (pandas behaviour).  Costs a second
        window sort over the SAME key shuffle.

    ``right_cols``: right payload columns to attach (default: all non-key,
    non-timestamp columns).  Attached columns are named ``{col}{suffix}``;
    the matched right timestamp is ``{right_on}{suffix}``.

    ``tolerance_seconds``: if set, matches farther than this from the left
    timestamp are nulled out (pandas ``merge_asof(tolerance=...)``); for
    ``nearest`` the tolerance is applied per direction before choosing.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    on = list(on)
    right_on = right_on or left_on
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_on]

    # SQL join equality never matches NULL keys, and `r.ts <= l.ts` never
    # matches a NULL right timestamp; a window partition WOULD group null
    # keys and a nulls-first ordering WOULD carry a null-ts payload, so drop
    # both up front — null-key left rows then fall through unmatched, like
    # the SQL oracle.  With no keys (`on=[]`) the join is a global as-of
    # (pandas merge_asof without `by`): a keyless window — single-partition,
    # so only sensible for driver-scale frames.
    not_null = F.col(right_on).isNotNull()
    for c in on:
        not_null = not_null & F.col(c).isNotNull()
    right = right.where(not_null)

    # right side: key + payload struct (timestamp first => deterministic
    # max-struct tie-break for duplicate (key, ts) rows)
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_on).alias(_TS),
        F.lit(False).alias(_SIDE),
        F.struct(F.col(right_on).alias(right_on), *[F.col(c) for c in right_cols]).alias(_PAYLOAD),
    )
    l = left.select(
        "*",
        F.col(left_on).alias(_TS),
        F.lit(True).alias(_SIDE),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if not on:
        # keyless global as-of = ONE window partition: every row serializes
        # through a single task.  Fine for driver-scale frames (the only
        # supported use, per the docstring) — warn loudly so a 100-GB frame
        # doesn't silently fall into this path (VERDICT r2 nit #2).
        import warnings

        warnings.warn(
            "asof_join with on=[] runs as a single-partition window; "
            "only use for driver-scale inputs. Provide key columns to "
            "distribute.",
            RuntimeWarning,
            stacklevel=2,
        )
    base = Window.partitionBy(*on) if on else Window.partitionBy()
    # backward frame: right rows sort BEFORE equal-ts left rows (inclusive
    # <=); forward frame: AFTER them (inclusive >=).  Both windows share the
    # same partition keys, so `nearest` pays one extra per-partition sort,
    # not a second shuffle.
    back_w = (
        base.orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_PAYLOAD).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        base.orderBy(F.col(_TS).asc(), F.col(_SIDE).desc(), F.col(_PAYLOAD).asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    # timestamp arithmetic in epoch seconds, DST-safe per type:
    #   * TIMESTAMP_NTZ refuses a double cast, and a bare ntz->ltz cast
    #     would go through the session timezone (differences skew across a
    #     DST transition) — to_utc_timestamp(col, 'UTC') interprets the
    #     wall time as UTC instead, which is offset-free;
    #   * TIMESTAMP (ltz) converts exactly via unix_micros;
    #   * numeric timestamps cast directly.
    ts_type = dict(unioned.dtypes)[_TS]
    def _num(col):
        if ts_type == "timestamp_ntz":
            return F.unix_micros(F.to_utc_timestamp(col, "UTC")) / F.lit(1e6)
        if ts_type == "timestamp":
            return F.unix_micros(col) / F.lit(1e6)
        if ts_type == "date":
            # DATE refuses a double cast; tolerance stays in seconds so a
            # daily-snapshot as-of can pass tolerance_seconds=86400*n
            return F.unix_date(col).cast("double") * F.lit(86400.0)
        return col.cast("double")

    def _gate(payload, signed_dist):
        """null out matches beyond the tolerance (distance is >= 0 by
        construction for each direction)."""
        if tolerance_seconds is None:
            return payload
        return F.when(signed_dist <= F.lit(float(tolerance_seconds)), payload)

    # materialize the window(s) BEFORE filtering to left rows — a filter
    # first would remove the right rows the window carries
    if direction == "backward":
        carried = unioned.withColumn("_asof_m", F.last(_PAYLOAD, ignorenulls=True).over(back_w))
        matched = _gate(F.col("_asof_m"),
                        _num(F.col(_TS)) - _num(F.col("_asof_m").getField(right_on)))
    elif direction == "forward":
        carried = unioned.withColumn("_asof_m", F.first(_PAYLOAD, ignorenulls=True).over(fwd_w))
        matched = _gate(F.col("_asof_m"),
                        _num(F.col("_asof_m").getField(right_on)) - _num(F.col(_TS)))
    else:  # nearest
        carried = (
            unioned.withColumn("_asof_b", F.last(_PAYLOAD, ignorenulls=True).over(back_w))
            .withColumn("_asof_f", F.first(_PAYLOAD, ignorenulls=True).over(fwd_w))
        )
        b_dist = _num(F.col(_TS)) - _num(F.col("_asof_b").getField(right_on))
        f_dist = _num(F.col("_asof_f").getField(right_on)) - _num(F.col(_TS))
        b = _gate(F.col("_asof_b"), b_dist)
        f = _gate(F.col("_asof_f"), f_dist)
        matched = (
            F.when(b.isNull(), f)
            .when(f.isNull(), b)
            # tie (equal distance) prefers backward, like pandas
            .when(b_dist <= f_dist, b)
            .otherwise(f)
        )

    # a NULL left timestamp matches nothing in ANY direction (SQL comparison
    # semantics; backward gets this for free from nulls-first ordering, but
    # the forward frame would otherwise see every right row)
    matched = F.when(F.col(_TS).isNotNull(), matched)

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(matched.getField(right_on).alias(f"{right_on}{suffix}"))
    out_cols += [matched.getField(c).alias(f"{c}{suffix}") for c in right_cols]
    return carried.where(F.col(_SIDE)).select(*out_cols)
