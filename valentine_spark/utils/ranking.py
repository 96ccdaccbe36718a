"""Distributed global row-number: the scale-correct form of
``row_number() OVER (ORDER BY ...)``.

A bare global window forces every row through ONE task (Spark even warns
"No Partition Defined for Window operation"); at the 10^10-value corpus the
reference's ``sort -n`` rank pass implies (``clustering_utils.py:259-305``),
that single task is the job. The classic two-phase formulation keeps the
total order while staying parallel:

  1. range-partition by the sort key (Spark samples split points) and sort
     within partitions — a distributed total sort, the same machinery as
     ``orderBy``;
  2. count rows per partition (one cheap action on the persisted sorted
     frame), prefix-sum the counts on the driver (#partitions integers);
  3. rank = partition-local ``row_number()`` + broadcast per-partition
     offset.

The sorted frame is persisted (memory-and-disk) so phases 2 and 3 share one
shuffle; Spark's context cleaner reclaims it when the result goes out of
scope.  Ordering ties must be broken by the key itself (pass a total key —
callers rank DISTINCT values, so the key is unique) or ranks would be
partition-placement-dependent.
"""

from __future__ import annotations

from typing import List, Sequence, Union

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

_PID = "_rank_pid"
_OFF = "_rank_off"


def distributed_row_number(
    df: DataFrame,
    sort_cols: Sequence[Union[str, Column]],
    rank_col: str = "rank",
    num_partitions: int = 0,
) -> DataFrame:
    """Adds ``rank_col`` = 1-based global row number under ``sort_cols``
    (ascending), computed without a single-partition window."""
    sort_exprs: List[Column] = [F.col(c) if isinstance(c, str) else c for c in sort_cols]
    if num_partitions <= 0:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))

    part = (
        df.repartitionByRange(num_partitions, *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in part.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    if not offsets:
        return df.withColumn(rank_col, F.lit(None).cast("long"))
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(offsets, f"{_PID} int, {_OFF} long")
    )
    w = Window.partitionBy(_PID).orderBy(*sort_exprs)
    return (
        part.join(off_df, _PID)
        .withColumn(rank_col, F.row_number().over(w) + F.col(_OFF))
        .drop(_PID, _OFF)
    )
