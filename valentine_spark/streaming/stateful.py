"""Custom stateful streaming operator: per-repo running ingest statistics
via ``applyInPandasWithState`` (the Arrow-batched custom-state pattern —
SURVEY.md §2.8; this is the per-partition lineage/metrics surface of the
north rule, maintained incrementally instead of recomputed).

State per repo: total events seen, per-op counts, max lsn, distinct-path
estimate (exact path set up to ``PATH_SET_CAP``; once capped, ``n_paths``
is a cardinality floor and ``n_paths_exact`` flips false).  Each
micro-batch emits the UPDATED rows only (output mode 'update')."""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# distinct-path state cap: below it the set is exact; at it, new paths stop
# being recorded and ``n_paths`` becomes a floor (``n_paths_exact=false``) —
# per-key state stays O(cap), never O(paths-per-repo)
PATH_SET_CAP = 4096

OUTPUT_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("n_events", LongType()),
        StructField("n_inserts", LongType()),
        StructField("n_updates", LongType()),
        StructField("n_deletes", LongType()),
        StructField("max_lsn", LongType()),
        StructField("n_paths", LongType()),
        StructField("n_paths_exact", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_inserts", LongType()),
        StructField("n_updates", LongType()),
        StructField("n_deletes", LongType()),
        StructField("max_lsn", LongType()),
        StructField("paths", ArrayType(StringType())),
    ]
)


def _update_repo_stats(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        vals = state.get
        if len(vals) == 5:
            # checkpoint written before the paths field existed: adopt the
            # old counters and start the path set empty (n_paths becomes a
            # floor over post-upgrade paths only — documented migration)
            n_events, n_ins, n_upd, n_del, max_lsn = vals
            path_set = set()
        else:
            n_events, n_ins, n_upd, n_del, max_lsn, paths = vals
            path_set = set(paths or ())
    else:
        n_events = n_ins = n_upd = n_del = 0
        max_lsn = -1
        path_set = set()
    for pdf in pdfs:
        n_events += len(pdf)
        ops = pdf["op"].value_counts()
        n_ins += int(ops.get("insert", 0))
        n_upd += int(ops.get("update", 0))
        n_del += int(ops.get("delete", 0))
        if len(pdf):
            max_lsn = max(max_lsn, int(pdf["lsn"].max()))
            if len(path_set) < PATH_SET_CAP:
                for p in pdf["path"].dropna().unique():
                    path_set.add(str(p))
                    if len(path_set) >= PATH_SET_CAP:
                        break
    exact = len(path_set) < PATH_SET_CAP
    state.update((n_events, n_ins, n_upd, n_del, max_lsn, sorted(path_set)))
    yield pd.DataFrame(
        {
            "repo": [key[0]],
            "n_events": [n_events],
            "n_inserts": [n_ins],
            "n_updates": [n_upd],
            "n_deletes": [n_del],
            "max_lsn": [max_lsn],
            "n_paths": [len(path_set)],
            "n_paths_exact": [exact],
        }
    )


def repo_stats_stream(stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-repo running statistics (update mode)."""
    return stream.groupBy("repo").applyInPandasWithState(
        _update_repo_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_repo_stats(
    stream: DataFrame,
    checkpoint_dir: str,
    query_name: str = "repo_stats",
    available_now: bool = True,
    sink_path: str | None = None,
):
    """Start the stateful query.

    ``sink_path=None``: in-memory sink for interactive inspection via
    ``spark.table(query_name)`` — NOTE: the memory sink cannot recover from
    an existing checkpoint, so it only serves single-run use.
    ``sink_path=...``: foreachBatch parquet append (restartable) — each
    micro-batch appends its updated repo rows; the row with max n_events
    per repo is the current state."""
    stats = repo_stats_stream(stream)
    if sink_path is None:
        writer = (
            stats.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
        )
    else:

        def append(batch_df: DataFrame, _batch_id: int) -> None:
            batch_df.write.mode("append").parquet(sink_path)

        writer = (
            stats.writeStream.foreachBatch(append)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
        )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
