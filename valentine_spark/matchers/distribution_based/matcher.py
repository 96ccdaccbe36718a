"""Distribution-based matcher (Zhang et al., "Automatic Discovery of
Attributes in Relational Databases", SIGMOD 2011) — Spark-native.

Pipeline (reference ``distribution_based.py:65-229`` re-architected for Spark,
SURVEY.md §3.2):

  1. **Global ranks** — ONE distributed job: union profile of both tables →
     ``distinct`` → range-partitioned global sort on (numeric-prefix, byte
     order) → ``row_number``.  This reproduces the reference's external
     ``sort -n`` + LC_ALL=C tie order (clustering_utils.py:259-305): GNU
     ``sort -n`` keys on the leading decimal prefix (sign + digits + optional
     fraction, NO exponent — that is ``sort -g``; 0 for non-numeric) and
     falls back to bytewise comparison; Spark's default
     UTF8_BINARY string ordering is exactly C-locale bytewise order.
     Values that coarsen to the same ``convert_data_type`` key collapse to
     their max rank (dict-insertion later-wins in the reference).
  2. **Column profiles** — per-column compressed rank multiset + equi-depth
     quantile histogram, one ``applyInPandas`` pass (Arrow-vectorized, numpy
     kernels; no per-row Python).  Partitioning: one group per column.
  3. **Pair EMD (phase 1)** — cross-table column pairs joined against the
     (tiny, broadcast) profile table, EMD per pair via ``mapInPandas``.
  4. **Clustering** — cutoff thresholds, connected components, phase-2
     intersection-EMD (again a Spark pair job), attribute graph, closed-form
     correlation clustering: all driver-side over O(cols²) floats.
  5. **Rank output** — intra-cluster cross-table pairs scored 1/(1+EMD),
     reusing the phase-1 EMDs (deterministic orientation: source column
     first; the reference recomputes them in set-iteration order —
     distribution_based.py:795-840).

Scale: steps 1-3 touch all instance data and are pure DataFrame jobs
(shuffles: one distinct + one global sort + one per-column grouping); steps
4-5 are driver-side by design.  At 100 TB the profile compression keeps the
pair phase bounded by Σ distinct ranks per column, not raw rows.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ...results import Match, MatchKey
from ...sources.profiles import profile_table
from . import discovery
from .kernels import (
    column_histogram,
    intersection_emd_kernel,
    quantile_emd_kernel,
    rank_counts,
)

_NUMERIC_PREFIX = r"^[ \t]*([+-]?(\d+(\.\d*)?|\.\d+))"

_PROFILE_SCHEMA = (
    "table_name string, column_name string, size long, min double, "
    "bb array<double>, hist array<double>, rvals array<double>, rcounts array<long>"
)

ColKey = Tuple[str, str]  # (table_name, column_name)


def _canon_expr():
    """convert_data_type canonicalization (utils/utils.py:15-22): numeric
    strings collapse to their int/float image so '1', '1.0' share a rank."""
    num = F.col("value_num")
    as_long = num.cast("long")
    integral = num.isNotNull() & (num == as_long.cast("double"))
    return (
        F.when(integral, as_long.cast("string"))
        .when(num.isNotNull(), num.cast("string"))
        .otherwise(F.col("value"))
    )


from .. import BaseMatcher


class DistributionBased(BaseMatcher):
    def __init__(
        self,
        threshold1: float = 0.15,
        threshold2: float = 0.15,
        quantiles: int = 256,
        process_num: int = 1,  # parity arg; Spark supplies parallelism
    ):
        self.threshold1 = float(threshold1)
        self.threshold2 = float(threshold2)
        self.quantiles = int(quantiles)

    # ------------------------------------------------------------------

    def get_matches(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ) -> Dict[MatchKey, float]:
        profile = profile_table(source, source_name).unionByName(
            profile_table(target, target_name)
        )

        ranked = self._global_ranks(profile)
        profiles_df = self._column_profiles(ranked).cache()

        cols_present = {
            (r["table_name"], r["column_name"])
            for r in profiles_df.select("table_name", "column_name").collect()
        }
        src_cols = [(source_name, c) for c in source.columns if (source_name, c) in cols_present]
        tgt_cols = [(target_name, c) for c in target.columns if (target_name, c) in cols_present]
        columns: List[ColKey] = src_cols + tgt_cols
        pairs = [(s, t) for s in src_cols for t in tgt_cols]

        emds = self._pair_emds(profiles_df, pairs, intersection=False)

        clusters = discovery.distribution_clusters(columns, emds, self.threshold1)

        plus_edges: List[Tuple[ColKey, ColKey]] = []
        for cluster in clusters:
            if len(cluster) < 2:
                continue
            members = [c for c in columns if c in cluster]  # deterministic order
            cpairs = [
                (a, b)
                for i, a in enumerate(members)
                for b in members[i + 1:]
                if a[0] != b[0]
            ]
            iemds = self._pair_emds(profiles_df, cpairs, intersection=True)
            # symmetric closure for the per-member neighbor lists
            plus_edges.extend(discovery.attribute_edges(members, iemds, self.threshold2))

        attribute_clusters = discovery.connected_components(columns, plus_edges)
        profiles_df.unpersist()

        matches: Dict[MatchKey, float] = {}
        for cluster in attribute_clusters:
            members = [c for c in columns if c in cluster]
            for i, a in enumerate(members):
                for b in members[i + 1:]:
                    if a[0] == b[0]:
                        continue
                    s, t = (a, b) if a[0] == source_name else (b, a)
                    emd = emds.get((s, t))
                    if emd is None or not discovery.is_finite(emd):
                        continue
                    sim = 1.0 / (1.0 + emd)
                    matches.update(Match(t[0], t[1], s[0], s[1], sim).to_dict)
        return matches

    def get_pairwise_similarities(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ) -> Dict[MatchKey, float]:
        """Phase-1-only variant: all cross-table pair similarities
        ``1/(1+EMD)`` without the clustering stages.  Used by the CDC drift
        cascade to match renamed columns whose value sets are DISJOINT but
        identically distributed (where the full algorithm's intersection-EMD
        phase would, by design, split them)."""
        profile = profile_table(source, source_name).unionByName(
            profile_table(target, target_name)
        )
        ranked = self._global_ranks(profile)
        profiles_df = self._column_profiles(ranked)
        cols_present = {
            (r["table_name"], r["column_name"])
            for r in profiles_df.select("table_name", "column_name").collect()
        }
        src_cols = [(source_name, c) for c in source.columns if (source_name, c) in cols_present]
        tgt_cols = [(target_name, c) for c in target.columns if (target_name, c) in cols_present]
        pairs = [(s, t) for s in src_cols for t in tgt_cols]
        emds = self._pair_emds(profiles_df, pairs, intersection=False)
        out: Dict[MatchKey, float] = {}
        for (s, t), emd in emds.items():
            if discovery.is_finite(emd):
                out[((s[0], s[1]), (t[0], t[1]))] = 1.0 / (1.0 + emd)
        return out

    # ------------------------------------------------------------------

    @staticmethod
    def _global_ranks(profile: DataFrame) -> DataFrame:
        """profile(table, column, value, value_num) -> (table, column, rank)."""
        corpus = profile.select("value").distinct()
        extracted = F.regexp_extract("value", _NUMERIC_PREFIX, 1)
        keyed = corpus.withColumn(
            "sort_num",
            F.when(extracted == "", F.lit(0.0)).otherwise(extracted.cast("double")),
        )
        from ...utils.ranking import distributed_row_number

        # distributed two-phase global rank — NOT a bare Window.orderBy,
        # which would serialize the whole corpus through one task
        ranked = distributed_row_number(keyed, ["sort_num", "value"], rank_col="rank")
        ranked = ranked.withColumn("rank", F.col("rank").cast("double"))
        # collapse to convert_data_type keys, later (= max) rank wins
        canon_ranks = (
            ranked.withColumn("value_num", F.expr("try_cast(value as double)"))
            .withColumn("canon", _canon_expr())
            .groupBy("canon")
            .agg(F.max("rank").alias("rank"))
        )
        return (
            profile.withColumn("canon", _canon_expr())
            .join(canon_ranks, "canon")
            .select("table_name", "column_name", "rank")
        )

    def _column_profiles(self, ranked: DataFrame) -> DataFrame:
        n_quantiles = self.quantiles

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            table = pdf["table_name"].iloc[0]
            column = pdf["column_name"].iloc[0]
            vals, counts = rank_counts(pdf["rank"].to_numpy())
            mn, bb, hist, size = column_histogram(vals, counts, n_quantiles)
            return pd.DataFrame(
                {
                    "table_name": [table],
                    "column_name": [column],
                    "size": [size],
                    "min": [mn],
                    "bb": [bb.tolist()],
                    "hist": [hist.tolist()],
                    "rvals": [vals.tolist()],
                    "rcounts": [counts.tolist()],
                }
            )

        return ranked.groupBy("table_name", "column_name").applyInPandas(build, _PROFILE_SCHEMA)

    def _pair_emds(
        self,
        profiles_df: DataFrame,
        pairs: List[Tuple[ColKey, ColKey]],
        intersection: bool,
    ) -> Dict[Tuple[ColKey, ColKey], float]:
        if not pairs:
            return {}
        spark = profiles_df.sparkSession
        n_quantiles = self.quantiles
        pairs_df = spark.createDataFrame(
            [(i, a[0], a[1], b[0], b[1]) for i, (a, b) in enumerate(pairs)],
            "pair_id long, a_table string, a_col string, b_table string, b_col string",
        )
        left = profiles_df.select(
            F.col("table_name").alias("a_table"),
            F.col("column_name").alias("a_col"),
            *[F.col(c).alias(f"a_{c}") for c in ("size", "min", "bb", "hist", "rvals", "rcounts")],
        )
        right = profiles_df.select(
            F.col("table_name").alias("b_table"),
            F.col("column_name").alias("b_col"),
            *[F.col(c).alias(f"b_{c}") for c in ("size", "min", "bb", "hist", "rvals", "rcounts")],
        )
        joined = pairs_df.join(left, ["a_table", "a_col"]).join(right, ["b_table", "b_col"])

        def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for row in pdf.itertuples(index=False):
                    a = {
                        "min": row.a_min,
                        "bb": np.asarray(row.a_bb, dtype=np.float64),
                        "hist": np.asarray(row.a_hist, dtype=np.float64),
                        "size": int(row.a_size),
                        "values": np.asarray(row.a_rvals, dtype=np.float64),
                        "counts": np.asarray(row.a_rcounts, dtype=np.int64),
                    }
                    b = {
                        "min": row.b_min,
                        "bb": np.asarray(row.b_bb, dtype=np.float64),
                        "hist": np.asarray(row.b_hist, dtype=np.float64),
                        "size": int(row.b_size),
                        "values": np.asarray(row.b_rvals, dtype=np.float64),
                        "counts": np.asarray(row.b_rcounts, dtype=np.int64),
                    }
                    if intersection:
                        emd = intersection_emd_kernel(a, b, n_quantiles)
                    else:
                        emd = quantile_emd_kernel(
                            a["min"], a["bb"], a["hist"], b["size"], b["values"], b["counts"]
                        )
                    out.append((row.pair_id, float(emd)))
                yield pd.DataFrame(out, columns=["pair_id", "emd"])

        result = joined.mapInPandas(compute, "pair_id long, emd double")
        emds = {r["pair_id"]: r["emd"] for r in result.collect()}
        # pairs pruned upstream (empty columns etc.) are DROPPED, not
        # defaulted — downstream ranks only the pairs present here
        return {pairs[i]: emds[i] for i in range(len(pairs)) if i in emds}
