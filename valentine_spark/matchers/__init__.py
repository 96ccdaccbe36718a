"""Matcher ABC — the extension point (reference ``base_matcher.py:7-17``).

A matcher consumes two tables and returns the match dict described in
``valentine_spark.results``.  Spark-native matchers receive Spark DataFrames
plus table names; the public API (``valentine_spark.valentine_match``) adapts
pandas inputs automatically.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict

from pyspark.sql import DataFrame

from ..results import MatchKey


class BaseMatcher(ABC):
    @abstractmethod
    def get_matches(
        self,
        source: DataFrame,
        target: DataFrame,
        source_name: str = "table_1",
        target_name: str = "table_2",
    ) -> Dict[MatchKey, float]:
        ...


from .jaccard import JaccardDistanceMatcher, StringDistanceFunction  # noqa: E402
from .similarity_flooding import SimilarityFlooding  # noqa: E402
from .cupid import Cupid  # noqa: E402
from .distribution_based import DistributionBased  # noqa: E402
from .coma import Coma  # noqa: E402

__all__ = [
    "BaseMatcher",
    "JaccardDistanceMatcher",
    "StringDistanceFunction",
    "SimilarityFlooding",
    "Cupid",
    "DistributionBased",
    "Coma",
]
