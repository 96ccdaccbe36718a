"""Golden-value tests mirroring the reference suite
(``/root/reference/tests/test_matcher_results.py`` and ``test_metrics.py``):
the hand-built 5-match fixture must yield Precision 0.75, Recall 0.6,
F1 ~0.67, PrecisionTop50Percent 1.0, RecallAtSizeofGroundTruth 0.6."""

import math

import pytest

from valentine_spark import MatcherResults
from valentine_spark.metrics import (
    F1Score,
    Precision,
    PrecisionTopNPercent,
    Recall,
    RecallAtSizeofGroundTruth,
    get_fp,
    get_tp_fn,
)

FIVE = {
    (("table_1", "Cited by"), ("table_2", "Cited by")): 0.8374313,
    (("table_1", "Authors"), ("table_2", "Authors")): 0.83498037,
    (("table_1", "EID"), ("table_2", "EID")): 0.8214057,
    (("table_1", "Title"), ("table_2", "DUMMY1")): 0.8214057,
    (("table_1", "Title"), ("table_2", "DUMMY2")): 0.8114057,
}

GT = [
    ("Cited by", "Cited by"),
    ("Authors", "Authors"),
    ("EID", "EID"),
    ("Title", "Title"),
    ("DUMMY3", "DUMMY3"),
]


@pytest.fixture()
def matches():
    return MatcherResults(FIVE)


def test_sorted_descending(matches):
    values = list(matches.values())
    assert values == sorted(values, reverse=True)


def test_precision(matches):
    assert Precision().apply(matches, GT) == {"Precision": 0.75}
    assert Precision(one_to_one=False).apply(matches, GT) == {"Precision": 0.6}


def test_recall(matches):
    assert Recall().apply(matches, GT) == {"Recall": 0.6}
    assert Recall(one_to_one=False).apply(matches, GT) == {"Recall": 0.6}


def test_f1(matches):
    f1 = F1Score().apply(matches, GT)["F1Score"]
    assert math.isclose(f1, 2 * (0.75 * 0.6) / (0.75 + 0.6), rel_tol=1e-9)
    assert F1Score(one_to_one=False).apply(matches, GT) == {"F1Score": 0.6}


def test_precision_top_n_percent(matches):
    assert PrecisionTopNPercent(n=0).apply(matches, GT) == {"PrecisionTop0Percent": 0}
    assert PrecisionTopNPercent(n=50).apply(matches, GT) == {"PrecisionTop50Percent": 1.0}
    assert (
        PrecisionTopNPercent(n=100).apply(matches, GT)["PrecisionTop100Percent"]
        == Precision().apply(matches, GT)["Precision"]
    )
    assert PrecisionTopNPercent(n=70, one_to_one=False).apply(matches, GT) == {
        "PrecisionTop70Percent": 0.75
    }


def test_recall_at_size_of_ground_truth(matches):
    assert RecallAtSizeofGroundTruth().apply(matches, GT) == {
        "RecallAtSizeofGroundTruth": 0.6
    }


def test_tp_fn_fp_helpers(matches):
    tp, fn = get_tp_fn(matches, GT)
    assert tp == 3 and fn == 2
    fp = get_fp(matches, GT)
    assert fp == 2
    tp_n, fn_n = get_tp_fn(matches, GT, n=2)
    assert tp_n == 2 and fn_n == 3
    assert get_fp(matches, GT, n=2) == 0


def test_one_to_one(matches):
    o2o = matches.one_to_one()
    # Title can match only once, below-median pairs dropped
    assert (("table_1", "Title"), ("table_2", "DUMMY2")) not in o2o
    assert len(o2o) <= len(matches)
    # cached copy is independent
    o2o2 = matches.one_to_one()
    assert o2o == o2o2 and o2o is not o2o2
    # single distinct similarity -> returned unchanged
    flat = MatcherResults({k: 0.5 for k in FIVE})
    assert len(flat.one_to_one()) == len(flat)


def test_one_to_one_median_bound():
    # all sims distinct: the greedy walk stops at the first below-median pair
    res = MatcherResults(
        {
            (("t1", "a"), ("t2", "a")): 0.9,
            (("t1", "b"), ("t2", "b")): 0.8,
            (("t1", "d"), ("t2", "d")): 0.3,
            (("t1", "c"), ("t2", "c")): 0.1,
        }
    )
    # distinct sims desc = [0.9, 0.8, 0.3, 0.1]; median index ceil(4/2)=2 -> 0.3
    o2o = res.one_to_one()
    assert (("t1", "d"), ("t2", "d")) in o2o
    assert (("t1", "c"), ("t2", "c")) not in o2o


def test_take_top_percent(matches):
    assert len(matches.take_top_percent(0)) == 0
    assert len(matches.take_top_percent(40)) == 2
    assert len(matches.take_top_percent(100)) == len(matches)


def test_take_top_n(matches):
    assert len(matches.take_top_n(0)) == 0
    assert len(matches.take_top_n(2)) == 2
    assert len(matches.take_top_n(len(matches))) == len(matches)
    assert len(matches.take_top_n(len(matches) + 1)) == len(matches)


def test_get_metrics_keys(matches):
    res = matches.get_metrics(GT)
    assert {"Precision", "Recall", "F1Score"} <= set(res.keys())


def test_copy_identity(matches):
    assert matches.get_copy() == matches


def test_metric_hash_equality():
    assert Precision() == Precision()
    assert len({Precision(), Precision(), Recall()}) == 2
    assert Precision(one_to_one=False) != Precision()
