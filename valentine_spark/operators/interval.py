"""Banded interval (range) join — point-in-interval matching at scale.

Spark executes a raw ``p BETWEEN lo AND hi`` join as BroadcastNestedLoopJoin:
every point is tested against every interval, O(|points| x |intervals|).
The banded formulation turns it into an equi-join:

  * points map to bucket ``floor(p / width)`` (one narrow column);
  * each interval explodes to the buckets it covers
    (``sequence(floor(lo/w), floor(hi/w))`` — fan-out = interval length /
    width, bounded and chosen by the caller);
  * equi-join on the bucket (hash join, shuffles on the bucket key) followed
    by the exact ``BETWEEN`` residual predicate.

Cost model: candidate pairs = pairs sharing a bucket, so ``bucket_width``
should be of the order of the typical interval length — small enough that a
bucket holds few intervals, large enough that interval fan-out stays modest.
Overlapping and irregular intervals are fine (each bucket copy carries the
full [lo, hi] for the residual check).  Duplicate elimination is structural:
a (point, interval) pair meets in EXACTLY the point's one bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Rows = (point row, interval row) where ``lo <= point <= hi``.

    ``how='inner'`` (default) or ``'left'`` (unmatched points kept with
    nulls).  Column sets must be disjoint apart from the join mechanics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width!r}")
    w = float(bucket_width)
    p = points.withColumn("_pb", F.floor(F.col(point_col) / w))
    # guard lo > hi: Spark's sequence(start, stop) AUTO-DESCENDS, so one
    # corrupt interval row (lo=1e9, hi=0) would try to materialize a
    # ~1e9-element array and abort the whole job.  Such rows can never
    # satisfy the lo <= point <= hi residual anyway — give them no buckets.
    iv = intervals.withColumn(
        "_ib",
        F.explode(
            F.when(
                F.col(lo_col) <= F.col(hi_col),
                F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w)),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )
    cond = (
        (F.col("_pb") == F.col("_ib"))
        & (F.col(point_col) >= F.col(lo_col))
        & (F.col(point_col) <= F.col(hi_col))
    )
    return p.join(iv, cond, how).drop("_pb", "_ib")
