"""Match results: the (tiny, driver-side) output of every matcher.

Semantics mirror the reference (``/root/reference/valentine/algorithms/match.py:6-25``
and ``matcher_results.py:9-159``): a matcher returns a dict keyed by
``((source_table, source_column), (target_table, target_column)) -> similarity``,
sorted descending by similarity.  Match dictionaries are O(|cols_1| x |cols_2|),
i.e. always small, so the transformations here (one-to-one, top-k, top-percent)
run on the driver by design — they are order-dependent greedy procedures that
must not be parallelized (see SURVEY.md §4).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Iterable, List, Tuple

MatchKey = Tuple[Tuple[str, str], Tuple[str, str]]


@dataclass(frozen=True)
class Match:
    """One column correspondence.

    ``target`` is the table whose columns we are mapping onto, ``source`` the
    other one.  Mirrors reference ``match.py:6-25`` (including the key layout
    of ``to_dict``: source pair first, target pair second).
    """

    target_table_name: str
    target_column_name: str
    source_table_name: str
    source_column_name: str
    similarity: float

    @property
    def to_dict(self) -> Dict[MatchKey, float]:
        key = (
            (self.source_table_name, self.source_column_name),
            (self.target_table_name, self.target_column_name),
        )
        return {key: self.similarity}


class MatcherResults(dict):
    """A similarity-sorted dict of matches with valentine-style transforms.

    Reference parity notes (``matcher_results.py``):
      * construction sorts by similarity descending (``:25-28``);
      * ``one_to_one`` removes everything under the *index-based* median of the
        distinct similarity values, then greedily assigns pairs best-first and
        **stops at the first non-assignable pair** (``:59-76``);
      * ``take_top_percent`` keeps ``ceil(p/100 * n)`` matches (``:81-103``);
      * results of ``one_to_one`` are cached (``:46-48``).
    """

    def __init__(self, res: Dict[MatchKey, float] | None = None):
        res = dict(res or {})
        ordered = sorted(res.items(), key=lambda kv: kv[1], reverse=True)
        super().__init__(ordered)
        self._one_to_one_cache: Dict[MatchKey, float] | None = None

    # -- transformations ---------------------------------------------------

    def one_to_one(self) -> "MatcherResults":
        if self._one_to_one_cache is not None:
            return MatcherResults(dict(self._one_to_one_cache))

        distinct_sims = set(self.values())
        if len(distinct_sims) < 2:
            self._one_to_one_cache = dict(self)
            return MatcherResults(dict(self))

        # Index-based median over the distinct similarity values, exactly as
        # the reference computes it: sorted desc, element at ceil(n/2).
        desc = sorted(distinct_sims, reverse=True)
        median = desc[math.ceil(len(desc) / 2)]

        taken: set = set()
        kept: Dict[MatchKey, float] = {}
        for key, sim in self.items():
            src, tgt = key
            if src in taken or tgt in taken:
                continue
            if sim >= median:
                kept[key] = sim
                taken.add(src)
                taken.add(tgt)
            else:
                break  # reference semantics: greedy walk stops here

        self._one_to_one_cache = kept
        return MatcherResults(dict(kept))

    def take_top_percent(self, percent: int) -> "MatcherResults":
        keep = int(math.ceil((percent / 100) * len(self)))
        return self.take_top_n(keep)

    def take_top_n(self, n: int) -> "MatcherResults":
        best = sorted(self.items(), key=lambda kv: kv[1], reverse=True)[:n]
        return MatcherResults(dict(best))

    # -- metrics -----------------------------------------------------------

    def get_metrics(
        self,
        ground_truth: List[Tuple[str, str]],
        metrics: Iterable | None = None,
    ) -> Dict[str, Any]:
        from .metrics import METRICS_CORE

        out: Dict[str, Any] = {}
        for metric in metrics if metrics is not None else METRICS_CORE:
            out.update(metric.apply(self, ground_truth))
        return out

    def get_copy(self) -> "MatcherResults":
        return MatcherResults(dict(self))

    # -- interop -----------------------------------------------------------

    def to_rows(self) -> List[Tuple[str, str, str, str, float]]:
        """Flatten to (src_table, src_col, tgt_table, tgt_col, sim) rows, the
        shape used when shipping matches into a Spark DataFrame."""
        return [(s[0], s[1], t[0], t[1], sim) for (s, t), sim in self.items()]
