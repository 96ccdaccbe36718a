"""Jaccard similarity matcher with fuzzy string matching.

Reference semantics (``/root/reference/valentine/algorithms/jaccard_distance/
jaccard_distance.py:43-189``): per cross-table column pair, let ``set1`` be the
smaller distinct value set (ties -> the target column's set) and ``set2`` the
larger; ``intersection`` counts elements of ``set1`` that have at least one
fuzzy hit in ``set2`` (normalized distance >= threshold, or raw Jaro/
Jaro-Winkler similarity >= threshold); ``sim = inter / (|set1|+|set2|-inter)``;
zero-similarity pairs are dropped.  ``Exact`` forces threshold 1.0, which under
normalized Levenshtein is plain string equality.

Spark design (SURVEY.md J1/J3/A5/A6):
  * ONE distinct-profile job per table (unpivot -> distinct) instead of
    O(cols) scans; the distinct profile is reused by every pair.
  * Exact: a single hash equi-join on (value) + groupBy(pair).count() — fully
    shuffle-partial-aggregated, broadcast side picked by AQE; scales linearly.
  * Fuzzy: pair-tagged theta join.  The pair spec (probe side = smaller set)
    is a tiny broadcast table; the value-level join is pruned with the
    length-band bound |len(a)-len(b)| <= (1-t) * max(len) which is implied by
    normalized-distance >= t (not applicable to Jaro variants).  The
    existential "first hit" early-exit of the reference becomes
    max(hit)-aggregation with partial aggregation pushed map-side.
  * Levenshtein uses the JVM built-in (codegen); Damerau/Hamming/Jaro/
    Jaro-Winkler use Arrow-batched pandas UDFs (functions/string_distance.py).
"""

from __future__ import annotations

import enum
from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, functions as F

from ..functions.string_distance import (
    damerau_levenshtein_udf,
    hamming_udf,
    jaro_udf,
    jaro_winkler_udf,
    normalized_similarity_expr,
)
from ..results import Match, MatchKey
from ..sources.profiles import profile_table


class StringDistanceFunction(enum.Enum):
    Levenshtein = "levenshtein"
    DamerauLevenshtein = "damerau_levenshtein"
    Hamming = "hamming"
    Jaro = "jaro"
    JaroWinkler = "jaro_winkler"
    Exact = "exact"


_NORMALIZED = {
    StringDistanceFunction.Levenshtein,
    StringDistanceFunction.Exact,
    StringDistanceFunction.DamerauLevenshtein,
    StringDistanceFunction.Hamming,
}


from . import BaseMatcher


class JaccardDistanceMatcher(BaseMatcher):
    def __init__(
        self,
        threshold_dist: float = 0.8,
        distance_fun: StringDistanceFunction = StringDistanceFunction.Levenshtein,
        process_num: int = 1,  # accepted for API parity; Spark supplies parallelism
    ):
        self.threshold_dist = float(threshold_dist)
        self.distance_fun = distance_fun

    # ------------------------------------------------------------------

    def get_matches(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ) -> Dict[MatchKey, float]:
        threshold = 1.0 if self.distance_fun == StringDistanceFunction.Exact else self.threshold_dist

        from pyspark import StorageLevel

        # the distinct profiles feed 2-4 separate actions (both size
        # collects, then the intersection job — twice in the fuzzy path's
        # probe/build union): persist them for the duration so each table's
        # unpivot+distinct shuffle runs once, not per action
        d_src = (
            profile_table(source, source_name).select("column_name", "value")
            .distinct().persist(StorageLevel.MEMORY_AND_DISK)
        )
        d_tgt = (
            profile_table(target, target_name).select("column_name", "value")
            .distinct().persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            sizes_src = {r["column_name"]: r["n"] for r in d_src.groupBy("column_name").agg(F.count("*").alias("n")).collect()}
            sizes_tgt = {r["column_name"]: r["n"] for r in d_tgt.groupBy("column_name").agg(F.count("*").alias("n")).collect()}

            if threshold > 1.0:
                # every distance function's (normalized) similarity is <= 1.0,
                # so the reference's `sim >= threshold` test never fires
                # (jaccard_distance.py:184-188): all intersections are empty
                # and the zero-sim filter yields {} — do not fall into the
                # exact-equality path, which would silently return matches
                inter = {}
            elif self.distance_fun == StringDistanceFunction.Exact or threshold == 1.0:
                inter = self._exact_intersections(d_src, d_tgt)
            else:
                inter = self._fuzzy_intersections(
                    d_src, d_tgt, source.columns, target.columns, sizes_src, sizes_tgt, threshold
                )
        finally:
            d_src.unpersist()
            d_tgt.unpersist()

        matches: Dict[MatchKey, float] = {}
        for s_col in source.columns:
            n1 = sizes_src.get(s_col, 0)
            for t_col in target.columns:
                n2 = sizes_tgt.get(t_col, 0)
                cnt = inter.get((s_col, t_col), 0)
                union = n1 + n2 - cnt
                sim = float(cnt) / union if union > 0 else 0.0
                if sim > 0.0:
                    matches.update(
                        Match(target_name, t_col, source_name, s_col, sim).to_dict
                    )
        return matches

    # ------------------------------------------------------------------

    @staticmethod
    def _exact_intersections(d_src: DataFrame, d_tgt: DataFrame) -> Dict[Tuple[str, str], int]:
        joined = (
            d_src.withColumnRenamed("column_name", "s_col")
            .join(d_tgt.withColumnRenamed("column_name", "t_col"), "value")
            .groupBy("s_col", "t_col")
            .agg(F.count("*").alias("inter"))
        )
        return {(r["s_col"], r["t_col"]): r["inter"] for r in joined.collect()}

    def _fuzzy_intersections(
        self,
        d_src: DataFrame,
        d_tgt: DataFrame,
        src_cols: List[str],
        tgt_cols: List[str],
        sizes_src: Dict[str, int],
        sizes_tgt: Dict[str, int],
        threshold: float,
    ) -> Dict[Tuple[str, str], int]:
        spark = d_src.sparkSession
        # Pair spec: probe = strictly-smaller distinct set, ties -> target set
        # (reference jaccard_distance.py:79-84).
        pair_rows = []
        for s_col in src_cols:
            if s_col not in sizes_src:
                continue
            for t_col in tgt_cols:
                if t_col not in sizes_tgt:
                    continue
                probe_is_src = sizes_src[s_col] < sizes_tgt[t_col]
                # pair_id is an OPAQUE index, not an encoding of the names:
                # a separator-encoded id both crashes the final split and
                # can COLLIDE when a column name contains the separator
                # ("a\x1fb"+"c" == "a"+"b\x1fc"), silently merging two pairs
                pair_rows.append((f"p{len(pair_rows)}", s_col, t_col, probe_is_src))
        if not pair_rows:
            return {}
        id_to_pair = {pid: (s, t) for pid, s, t, _ in pair_rows}
        pairs = spark.createDataFrame(pair_rows, "pair_id string, s_col string, t_col string, probe_is_src boolean")

        src_vals = d_src.withColumnRenamed("column_name", "c").withColumnRenamed("value", "v")
        tgt_vals = d_tgt.withColumnRenamed("column_name", "c").withColumnRenamed("value", "v")

        probe = (
            F.broadcast(pairs).where("probe_is_src").join(src_vals, F.col("s_col") == F.col("c")).select("pair_id", F.col("v").alias("pv"))
            .unionByName(
                F.broadcast(pairs).where(~F.col("probe_is_src")).join(tgt_vals, F.col("t_col") == F.col("c")).select("pair_id", F.col("v").alias("pv"))
            )
        )
        build = (
            F.broadcast(pairs).where("probe_is_src").join(tgt_vals, F.col("t_col") == F.col("c")).select("pair_id", F.col("v").alias("bv"))
            .unionByName(
                F.broadcast(pairs).where(~F.col("probe_is_src")).join(src_vals, F.col("s_col") == F.col("c")).select("pair_id", F.col("v").alias("bv"))
            )
        )

        if self.distance_fun in _NORMALIZED and threshold > 0.5:
            # Length-bucket BLOCKING (not just a post-filter): normalized
            # sim >= t implies min_len >= t * max_len, i.e. the length ratio
            # lies in [t, 1/t].  Bucketing lengths on a log scale with base
            # 1/t, matching values differ by at most one bucket — so the
            # probe side explodes to 3 candidate buckets and the join runs
            # on (pair_id, bucket) instead of pair_id alone.  This bounds
            # the per-pair fan-out to values of comparable length: the
            # difference between |v1| x |v2| and near-linear at 100 TB.
            import math as _math

            log_base = _math.log(1.0 / threshold)
            bucket = F.floor(F.log(F.greatest(F.length("bv"), F.lit(1))) / log_base)
            build = build.withColumn("_lb", bucket.cast("long"))
            p_bucket = F.floor(F.log(F.greatest(F.length("pv"), F.lit(1))) / log_base).cast("long")
            probe = probe.withColumn(
                "_lb", F.explode(F.array(p_bucket - 1, p_bucket, p_bucket + 1))
            )
            cand = probe.join(build, ["pair_id", "_lb"]).drop("_lb")
        else:
            cand = probe.join(build, "pair_id")
        if self.distance_fun in _NORMALIZED:
            # exact length-band prune implied by normalized distance >= t
            band = F.abs(F.length("pv") - F.length("bv")) <= (1.0 - threshold) * F.greatest(
                F.length("pv"), F.length("bv")
            )
            cand = cand.where(band)

        if self.distance_fun == StringDistanceFunction.Levenshtein:
            dist = F.levenshtein("pv", "bv")
        elif self.distance_fun == StringDistanceFunction.DamerauLevenshtein:
            dist = damerau_levenshtein_udf("pv", "bv")
        elif self.distance_fun == StringDistanceFunction.Hamming:
            dist = hamming_udf("pv", "bv")
        elif self.distance_fun == StringDistanceFunction.Jaro:
            dist = None
            sim = jaro_udf("pv", "bv")
        elif self.distance_fun == StringDistanceFunction.JaroWinkler:
            dist = None
            sim = jaro_winkler_udf("pv", "bv")
        else:  # pragma: no cover
            raise ValueError(self.distance_fun)

        if self.distance_fun in _NORMALIZED:
            sim = normalized_similarity_expr(dist, "pv", "bv")

        hits = (
            cand.withColumn("hit", (sim >= F.lit(threshold)).cast("int"))
            .groupBy("pair_id", "pv")
            .agg(F.max("hit").alias("hit"))
            .groupBy("pair_id")
            .agg(F.sum("hit").alias("inter"))
        )
        out: Dict[Tuple[str, str], int] = {}
        for r in hits.collect():
            out[id_to_pair[r["pair_id"]]] = int(r["inter"])
        return out
