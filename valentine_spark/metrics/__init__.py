"""Effectiveness metrics over match results vs a ground truth.

Semantics mirror the reference (``/root/reference/valentine/metrics/metrics.py``
and ``metric_helpers.py:8-81``).  Golden values pinned by tests (reference
``tests/test_metrics.py:24-61``): Precision 0.75, Recall 0.6, F1 ~0.67,
PrecisionTop50Percent 1.0, RecallAtSizeofGroundTruth 0.6 on the 5-match
fixture.  All metrics operate on the driver-side (tiny) match dict; the
TP/FN/FP membership tests are set lookups over *column-name pairs only*
(table names are ignored, reference ``metric_helpers.py:34``).
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple


def _name_pairs(matches, n: int | None = None) -> List[Tuple[str, str]]:
    pairs = [(src[1], tgt[1]) for src, tgt in matches.keys()]
    return pairs if n is None else pairs[:n]


def get_tp_fn(matches, ground_truth: List[Tuple[str, str]], n: int | None = None):
    # n-truncation BEFORE the set conversion (the top-n cut is positional)
    found = set(_name_pairs(matches, n))
    tp = sum(1 for expected in ground_truth if tuple(expected) in found)
    return tp, len(ground_truth) - tp


def get_fp(matches, ground_truth: List[Tuple[str, str]], n: int | None = None):
    truth = {tuple(g) for g in ground_truth}
    return sum(1 for pair in _name_pairs(matches, n) if pair not in truth)


@dataclass(eq=True, frozen=True)
class Metric(ABC):
    """Base metric; subclass and override ``apply`` to extend (mirrors the
    reference extension point ``metrics/base_metric.py:14-66``)."""

    @abstractmethod
    def apply(self, matches, ground_truth: List[Tuple[str, str]]) -> Dict[str, Any]:
        ...

    def name(self) -> str:
        return self.__class__.__name__

    def return_format(self, value: Any) -> Dict[str, Any]:
        return {self.name(): value}


@dataclass(eq=True, frozen=True)
class Precision(Metric):
    one_to_one: bool = True

    def apply(self, matches, ground_truth):
        if self.one_to_one:
            matches = matches.one_to_one()
        tp, _ = get_tp_fn(matches, ground_truth)
        fp = get_fp(matches, ground_truth)
        return self.return_format(tp / (tp + fp) if tp + fp > 0 else 0)


@dataclass(eq=True, frozen=True)
class Recall(Metric):
    one_to_one: bool = True

    def apply(self, matches, ground_truth):
        if self.one_to_one:
            matches = matches.one_to_one()
        tp, fn = get_tp_fn(matches, ground_truth)
        return self.return_format(tp / (tp + fn) if tp + fn > 0 else 0)


@dataclass(eq=True, frozen=True)
class F1Score(Metric):
    one_to_one: bool = True

    def apply(self, matches, ground_truth):
        if self.one_to_one:
            matches = matches.one_to_one()
        tp, fn = get_tp_fn(matches, ground_truth)
        fp = get_fp(matches, ground_truth)
        if tp <= 0:
            return self.return_format(0)
        pr, re = tp / (tp + fp), tp / (tp + fn)
        return self.return_format(2 * pr * re / (pr + re))


@dataclass(eq=True, frozen=True)
class PrecisionTopNPercent(Metric):
    one_to_one: bool = True
    n: int = 10

    def name(self) -> str:
        return super().name().replace("N", str(self.n))

    def apply(self, matches, ground_truth):
        if self.one_to_one:
            matches = matches.one_to_one()
        top = matches.take_top_percent(self.n)
        tp, _ = get_tp_fn(top, ground_truth)
        fp = get_fp(top, ground_truth)
        return self.return_format(tp / (tp + fp) if tp + fp > 0 else 0)


@dataclass(eq=True, frozen=True)
class RecallAtSizeofGroundTruth(Metric):
    def apply(self, matches, ground_truth):
        top = matches.take_top_n(len(ground_truth))
        tp, fn = get_tp_fn(top, ground_truth)
        return self.return_format(tp / (tp + fn) if tp + fn > 0 else 0)


METRICS_CORE = {Precision(), Recall(), F1Score(), PrecisionTopNPercent(), RecallAtSizeofGroundTruth()}
METRICS_PRECISION_RECALL = {Precision(), Recall()}
METRICS_PRECISION_INCREASING_N = {PrecisionTopNPercent(n=i) for i in range(10, 110, 10)}  # n=10..100, reference metrics/__init__.py:8
METRICS_ALL = METRICS_CORE | METRICS_PRECISION_INCREASING_N

__all__ = [
    "Metric",
    "Precision",
    "Recall",
    "F1Score",
    "PrecisionTopNPercent",
    "RecallAtSizeofGroundTruth",
    "METRICS_CORE",
    "METRICS_ALL",
    "METRICS_PRECISION_RECALL",
    "METRICS_PRECISION_INCREASING_N",
    "get_tp_fn",
    "get_fp",
]
