"""valentine_spark — a PySpark-native schema-matching + CDC/incremental-ingest
engine with the capabilities of delftdata/valentine.

Public API (mirrors reference ``valentine/__init__.py:14-52``):
  * ``valentine_match(df1, df2, matcher, name1, name2)`` -> MatcherResults
  * ``valentine_match_batch(iter1, iter2, matcher, names1, names2)``
  * matchers: JaccardDistanceMatcher, DistributionBased, SimilarityFlooding,
    Cupid, Coma (stub)
  * metrics: ``valentine_spark.metrics``

Inputs may be pandas or Spark DataFrames; pandas frames are converted through
the active SparkSession.  The CDC engine lives in ``valentine_spark.cdc``;
large-scale data-pipeline operators in ``valentine_spark.operators``.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

from .matchers import (
    BaseMatcher,
    Coma,
    Cupid,
    DistributionBased,
    JaccardDistanceMatcher,
    SimilarityFlooding,
    StringDistanceFunction,
)
from .results import Match, MatcherResults
from .sources.profiles import as_spark

__version__ = "0.1.0"


class NotAValentineMatcher(Exception):
    pass


def _validate_matcher(matcher) -> None:
    if not hasattr(matcher, "get_matches") or isinstance(matcher, type):
        raise NotAValentineMatcher("Please provide a valid matcher instance")


def valentine_match(
    df1,
    df2,
    matcher,
    df1_name: str = "table_1",
    df2_name: str = "table_2",
) -> MatcherResults:
    _validate_matcher(matcher)
    sdf1 = as_spark(df1)
    sdf2 = as_spark(df2)
    matches = matcher.get_matches(sdf1, sdf2, df1_name, df2_name)
    return MatcherResults(matches)


def valentine_match_batch(
    df_iter_1: Iterable,
    df_iter_2: Iterable,
    matcher,
    df_iter_1_names: Optional[List[str]] = None,
    df_iter_2_names: Optional[List[str]] = None,
) -> MatcherResults:
    """Nested-loop batch matching with later-pair-wins dict union
    (reference ``valentine/__init__.py:34-52``)."""
    _validate_matcher(matcher)
    matches: dict = {}
    frames_2 = list(df_iter_2)
    for i, df1 in enumerate(df_iter_1):
        name1 = df_iter_1_names[i] if df_iter_1_names else f"table_1_{i}"
        for j, df2 in enumerate(frames_2):
            name2 = df_iter_2_names[j] if df_iter_2_names else f"table_2_{j}"
            matches.update(matcher.get_matches(as_spark(df1), as_spark(df2), name1, name2))
    return MatcherResults(matches)


__all__ = [
    "valentine_match",
    "valentine_match_batch",
    "NotAValentineMatcher",
    "MatcherResults",
    "Match",
    "BaseMatcher",
    "JaccardDistanceMatcher",
    "StringDistanceFunction",
    "DistributionBased",
    "SimilarityFlooding",
    "Cupid",
    "Coma",
]
