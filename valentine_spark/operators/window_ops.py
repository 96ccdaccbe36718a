"""Windowed/ordered operators over event streams: last-writer-wins snapshots,
gap-based sessionization, top-k.  These are the query-shaped counterparts of
the CDC engine's internals (the engine itself uses the salted max_by variant —
valentine_spark.cdc.apply)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def latest_event_per_user(df: DataFrame) -> DataFrame:
    """LWW snapshot of the events table: one row per user_id, the event with
    max (ts, event_id).

    DELIBERATELY window-formulated (not max_by): it is the SQL-oracle shape,
    and Catalyst's WindowGroupLimit rewrite makes it measured-equivalent to
    the agg form (BENCH/BASELINE.md §2).  The CDC engine's internal sibling
    is ``cdc.apply.lww_dedup_window`` — keep their ordering/tie-break
    semantics in sync (and the SQL oracles) if either changes."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


def sessionize(df: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time since
    the previous event exceeds the gap.  Returns per-session aggregates."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    with_flag = df.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            # sub-second-exact gap: timestamp subtraction yields a day-time
            # interval at microsecond precision, where unix_timestamp() would
            # truncate to whole seconds and misjudge event pairs straddling
            # the gap boundary by <1 s (DuckDB's epoch(ts) is fractional, so
            # the oracle compares full precision); intervals also work for
            # TIMESTAMP_NTZ, which refuses a double cast
            | (F.col("ts") - F.lag("ts").over(w) > F.make_dt_interval(secs=F.lit(gap_s))),
            1,
        ).otherwise(0),
    )
    with_id = with_flag.withColumn("session_seq", F.sum("new_session").over(w))
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def sessionize_sliced(
    df: DataFrame, gap_minutes: int = 30, slice_minutes: int | None = None
) -> DataFrame:
    """Skew-proof sessionization: identical output to :func:`sessionize`,
    but the per-user sort is bounded by a time slice, not the user's whole
    history.

    ``sessionize`` is inherently sequential per key — the running
    session-id sum needs the user's full ordered history, so a hot user IS
    one sorted window partition (BENCH/BASELINE.md §2b: 2.2x wall at 50 %
    hot share).  This variant breaks that floor:

    1. **Slice**: assign each event to a fixed time slice of width
       ``slice_minutes`` (must be >= ``gap_minutes``; default = gap).  With
       slices at least one gap wide, events in NON-adjacent slices are
       always more than ``gap`` apart, so sessions can only merge across a
       shared boundary of consecutive slices.
    2. **Local sessionize** per ``(user, slice)`` — the same strict
       ``delta > gap`` rule as :func:`sessionize`, but the window partition
       is now at most one slice of one user's events.  A user owning half
       the stream over 30 days at a 30-min slice sorts ~1/1440th of their
       rows per partition instead of all of them.
    3. **Stitch** on per-slice SUMMARIES (one row per non-empty
       ``(user, slice)`` — O(span/slice) rows per user, thousands not
       millions): slice k+1's first local session continues slice k's last
       session iff the slices are consecutive integers and
       ``first_ts(k+1) - last_ts(k) <= gap`` (the complement of the strict
       ``>`` rule, so boundary semantics match exactly).  A running count
       of session STARTS per slice (``n_local_sessions - merged_flag``)
       then renumbers every local session to the same 1-based
       ``session_seq`` the single-window form produces.
    4. Re-aggregate local partials per global session id.

    The stitch window partitions by user over summary rows only — the hot
    key's sequential floor drops from O(h log h) in its event count h to
    O(s) in its non-empty slice count s.  Cross-checked row-for-row against
    :func:`sessionize` (incl. exact-gap deltas) in tests; measured win under
    skew in BENCH/BASELINE.md §2b."""
    gap_s = gap_minutes * 60
    if slice_minutes is None:
        slice_minutes = gap_minutes
    if slice_minutes < gap_minutes:
        raise ValueError(
            f"slice_minutes ({slice_minutes}) must be >= gap_minutes ({gap_minutes}): "
            "narrower slices would let sessions merge across non-adjacent slices, "
            "which the boundary stitch deliberately does not handle"
        )
    slice_s = slice_minutes * 60
    # Whole-second slice boundaries (unix_timestamp truncates) are fine: the
    # slice id only needs to be monotone in ts so slices stay contiguous time
    # intervals; the gap tests below run at full microsecond precision.
    sliced = df.withColumn("_slice", F.floor(F.unix_timestamp("ts") / F.lit(slice_s)))

    w_loc = Window.partitionBy("user_id", "_slice").orderBy("ts", "event_id")
    local = (
        sliced.withColumn(
            "_new",
            F.when(
                F.lag("ts").over(w_loc).isNull()
                | (F.col("ts") - F.lag("ts").over(w_loc) > F.make_dt_interval(secs=F.lit(gap_s))),
                1,
            ).otherwise(0),
        )
        .withColumn("_loc_seq", F.sum("_new").over(w_loc))
        .groupBy("user_id", "_slice", "_loc_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum("value").alias("_sum_value"),  # raw; round once at the end
        )
    )

    summary = local.groupBy("user_id", "_slice").agg(
        F.max("_loc_seq").alias("_m"),
        F.min("session_start").alias("_first_ts"),
        F.max("session_end").alias("_last_ts"),
    )
    w_sum = Window.partitionBy("user_id").orderBy("_slice")
    stitched = (
        summary.withColumn(
            "_merged",
            F.when(
                (F.lag("_slice").over(w_sum) == F.col("_slice") - 1)
                & (
                    F.col("_first_ts") - F.lag("_last_ts").over(w_sum)
                    <= F.make_dt_interval(secs=F.lit(gap_s))
                ),
                1,
            ).otherwise(0),
        )
        # global sessions started strictly before this slice
        .withColumn(
            "_base",
            F.sum(F.col("_m") - F.col("_merged")).over(w_sum) - (F.col("_m") - F.col("_merged")),
        )
        .select("user_id", "_slice", "_merged", "_base")
    )

    return (
        local.join(stitched, ["user_id", "_slice"])
        .withColumn("session_seq", F.col("_base") + F.col("_loc_seq") - F.col("_merged"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.round(F.sum("_sum_value"), 6).alias("total_value"),
        )
    )


def topk_by(df: DataFrame, order_col: str, k: int, tiebreak_col: str) -> DataFrame:
    """Global top-k with deterministic tie-break — compiles to
    TakeOrderedAndProject (no full sort materialization)."""
    return df.orderBy(F.col(order_col).desc(), F.col(tiebreak_col)).limit(k)
