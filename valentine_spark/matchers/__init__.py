"""Matcher ABC — the extension point (reference ``base_matcher.py:7-17``).

A matcher consumes two tables and returns the match dict described in
``valentine_spark.results``.  Spark-native matchers receive Spark DataFrames
plus table names; the public API (``valentine_spark.valentine_match``) adapts
pandas inputs automatically.
"""

from __future__ import annotations

import functools
from abc import ABC, abstractmethod
from typing import Dict

from pyspark.sql import DataFrame

from ..results import MatcherResults, MatchKey


def _adapt_inputs(fn):
    """Accept the reference's calling shapes (``base_matcher.py:7-17``):
    table objects with ``get_df()``/``name`` (the ``DataframeTable`` shim),
    pandas frames, or Spark DataFrames; table names fall back to the table
    object's name.  The result is returned as a ``MatcherResults`` (a dict
    subclass, so the reference's plain-dict contract still holds)."""

    @functools.wraps(fn)
    def wrapper(self, source, target, source_name=None, target_name=None):
        from ..sources.profiles import as_spark

        if hasattr(source, "get_df"):
            source_name = source_name or getattr(source, "name", None)
            source = source.get_df()
        if hasattr(target, "get_df"):
            target_name = target_name or getattr(target, "name", None)
            target = target.get_df()
        raw = fn(
            self,
            as_spark(source),
            as_spark(target),
            source_name or "table_1",
            target_name or "table_2",
        )
        return raw if isinstance(raw, MatcherResults) else MatcherResults(raw)

    return wrapper


class BaseMatcher(ABC):
    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if "get_matches" in cls.__dict__:
            cls.get_matches = _adapt_inputs(cls.__dict__["get_matches"])

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
