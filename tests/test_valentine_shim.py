"""Import-compatibility shim: the reference's own import shapes
(/root/reference/tests/*.py and README usage) must resolve and work."""

import math

import pandas as pd
import pytest


def test_reference_import_surface():
    from valentine import NotAValentineMatcher, valentine_match, valentine_match_batch  # noqa
    from valentine.algorithms import (  # noqa
        BaseMatcher,
        Coma,
        Cupid,
        DistributionBased,
        JaccardDistanceMatcher,
        SimilarityFlooding,
        all_matchers,
        instance_only_algorithms,
        schema_only_algorithms,
    )
    from valentine.algorithms.jaccard_distance import StringDistanceFunction  # noqa
    from valentine.algorithms.matcher_results import MatcherResults  # noqa
    from valentine.data_sources import DataframeTable  # noqa
    from valentine.data_sources.utils import get_delimiter, get_encoding, is_date  # noqa
    from valentine.metrics import METRICS_CORE, F1Score, Precision, PrecisionTopNPercent  # noqa
    from valentine.metrics.metric_helpers import get_fp, get_tp_fn  # noqa
    from valentine.utils.utils import convert_data_type, is_sorted  # noqa

    assert set(schema_only_algorithms) == {"SimilarityFlooding", "Cupid"}
    assert set(instance_only_algorithms) == {"DistributionBased", "JaccardDistanceMatcher"}


def test_reference_usage_happy_path(spark, authors_pd, ground_truth):
    from valentine import valentine_match
    from valentine.algorithms import JaccardDistanceMatcher
    from valentine.algorithms.jaccard_distance import StringDistanceFunction
    from valentine.metrics import F1Score, PrecisionTopNPercent

    df1, df2 = authors_pd
    matches = valentine_match(
        df1, df2, JaccardDistanceMatcher(distance_fun=StringDistanceFunction.Exact)
    )
    assert len(matches) > 0
    metrics = matches.get_metrics(ground_truth, {F1Score(), PrecisionTopNPercent(n=80)})
    assert math.isclose(metrics["F1Score"], 1.0)


def test_table_introspection_surface(spark):
    """The full BaseTable/BaseColumn introspection surface of the reference
    (base_table.py:10-65, base_column.py:4-38, dataframe_column.py:4-27):
    get_columns() objects with name/data_type/uid/data/size, the guid
    lookup, and the reference's verbatim uid quirk (first two characters of
    the table name)."""
    import pandas as pd

    from valentine.data_sources import DataframeTable

    pdf = pd.DataFrame(
        {
            "EID": ["a1", "b2", None],
            "Cited by": [3, None, 7],
            "score": [1.5, 2.5, 3.5],
            "when": ["2021-01-02", "2021-05-06", None],
        }
    )
    t = DataframeTable(pdf, name="authors1")
    assert t.unique_identifier == "authors1"
    assert not t.is_empty
    cols = {c.name: c for c in t.get_columns()}
    assert set(cols) == {"EID", "Cited by", "score", "when"}
    # reference quirk: table_guid is the NAME string, uid indexes chars 0,1
    assert cols["EID"].unique_identifier == "a_u:EID"
    assert t.get_guid_column_lookup()["score"] == "a_u:score"
    # lattice types from the Spark schema (+date sniff on strings)
    assert cols["EID"].data_type == "varchar"
    assert cols["Cited by"].data_type in ("int", "float")  # pandas promotes NaN->float
    assert cols["score"].data_type == "float"
    assert cols["when"].data_type == "date"
    # per-column dropna + lazy collect
    assert sorted(cols["EID"].data) == ["a1", "b2"]
    assert cols["EID"].size == 2 and not cols["EID"].is_empty
    assert sorted(cols["Cited by"].data) == [3.0, 7.0]


def test_shim_utils():
    from valentine.utils.utils import convert_data_type, is_sorted, normalize_distance

    assert convert_data_type("15.0") == 15
    assert is_sorted({"a": 0.9, "b": 0.5, "c": 0.5})
    assert not is_sorted({"a": 0.1, "b": 0.5})
    assert normalize_distance(2, "abcd", "abcdef") == 1 - 2 / 6
