"""Parity run on the reference's OWN fixture pair: loads the real
``tests/data/authors{1,2}.csv`` from the read-only reference checkout and
mirrors every assertion of ``/root/reference/tests/test_algorithms.py``
through the reference's own import shapes (the ``valentine`` shim), plus
stronger semantic checks the reference's paper/README imply (shared
identical columns score 1.0 under Jaccard-Exact; ground truth recalled).

The reference package itself is not runnable in this container (jellyfish/
nltk/anytree/pulp absent), so this is the closest executable form of the
BASELINE "reproduce the matcher outputs on its pytest suite" rule: same
data, same imports, same assertions, our engine underneath.
"""

import math
import os

import pandas as pd
import pytest

REF_DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference checkout not present"
)

GROUND_TRUTH = [("Cited by", "Cited by"), ("Authors", "Authors"), ("EID", "EID")]


@pytest.fixture(scope="module")
def ref_pair():
    df1 = pd.read_csv(os.path.join(REF_DATA, "authors1.csv"))
    df2 = pd.read_csv(os.path.join(REF_DATA, "authors2.csv"))
    return df1, df2


@pytest.fixture(scope="module")
def ref_tables(spark, ref_pair):
    # the reference's exact construction shape (tests/test_algorithms.py:8-9)
    from valentine.data_sources import DataframeTable

    df1, df2 = ref_pair
    return DataframeTable(df1, name="authors1"), DataframeTable(df2, name="authors2")


def test_csv_sniffing_on_reference_fixture():
    from valentine.data_sources.utils import get_delimiter, get_encoding

    for name in ("authors1.csv", "authors2.csv"):
        path = os.path.join(REF_DATA, name)
        assert get_encoding(path).lower().startswith("utf")
        assert get_delimiter(path) == ","


def test_jaccard_exact_reference_fixture(ref_tables):
    from valentine.algorithms import JaccardDistanceMatcher
    from valentine.algorithms.jaccard_distance import StringDistanceFunction

    d1, d2 = ref_tables
    matches = JaccardDistanceMatcher(
        distance_fun=StringDistanceFunction.Exact
    ).get_matches(d1, d2)
    assert len(matches) > 0  # reference test_jaccard
    # identical shared columns score exactly 1.0 (table names flow through)
    for col in ("EID", "Authors", "Cited by"):
        assert math.isclose(matches[(("authors1", col), ("authors2", col))], 1.0)
    metrics = matches.get_metrics(GROUND_TRUTH)
    assert metrics["Recall"] == 1.0


@pytest.mark.parametrize(
    "distance_function",
    ["Hamming", "Levenshtein", "DamerauLevenshtein", "JaroWinkler", "Jaro"],
)
def test_jaccard_distance_function_reference_fixture(ref_tables, distance_function):
    # mirrors reference test_jaccard_distance_function (both variants)
    from valentine.algorithms import JaccardDistanceMatcher
    from valentine.algorithms.jaccard_distance import StringDistanceFunction

    d1, d2 = ref_tables
    fun = getattr(StringDistanceFunction, distance_function)
    assert len(JaccardDistanceMatcher(distance_fun=fun).get_matches(d1, d2)) > 0
    assert (
        len(
            JaccardDistanceMatcher(
                threshold_dist=0.5, process_num=2, distance_fun=fun
            ).get_matches(d1, d2)
        )
        > 0
    )


def test_distribution_based_reference_fixture(ref_tables):
    # mirrors reference test_distribution_based (serial + process_num=2)
    from valentine.algorithms import DistributionBased

    d1, d2 = ref_tables
    matches = DistributionBased().get_matches(d1, d2)
    assert len(matches) > 0
    assert len(DistributionBased(process_num=2).get_matches(d1, d2)) > 0
    metrics = matches.get_metrics(GROUND_TRUTH)
    assert metrics["RecallAtSizeofGroundTruth"] > 0.5


def test_cupid_reference_fixture(ref_tables):
    # mirrors reference test_cupid (serial + parallelism=2)
    from valentine.algorithms import Cupid

    d1, d2 = ref_tables
    matches = Cupid().get_matches(d1, d2)
    assert len(matches) > 0
    assert len(Cupid(parallelism=2).get_matches(d1, d2)) > 0
    for col in ("EID", "Authors", "Cited by"):
        assert (("authors1", col), ("authors2", col)) in matches


def test_similarity_flooding_reference_fixture(ref_tables):
    # mirrors reference test_similarity_flooding
    from valentine.algorithms import SimilarityFlooding

    d1, d2 = ref_tables
    matches = SimilarityFlooding().get_matches(d1, d2)
    assert len(matches) > 0
    name_pairs = {(s[1], t[1]) for (s, t) in matches.keys()}
    assert ("EID", "EID") in name_pairs


def test_coma_reference_fixture(ref_tables):
    # documented divergence: the Coma jar is absent from the reference
    # checkout itself (.MISSING_LARGE_BLOBS) — informative error instead
    from valentine.algorithms import Coma

    d1, d2 = ref_tables
    with pytest.raises(NotImplementedError):
        Coma(use_instances=False).get_matches(d1, d2)


def test_valentine_match_on_reference_fixture(spark, ref_pair):
    # the README's primary usage shape on the real fixture data
    from valentine import valentine_match
    from valentine.algorithms import JaccardDistanceMatcher
    from valentine.algorithms.jaccard_distance import StringDistanceFunction

    df1, df2 = ref_pair
    matches = valentine_match(
        spark.createDataFrame(df1),
        spark.createDataFrame(df2),
        JaccardDistanceMatcher(distance_fun=StringDistanceFunction.Exact),
        df1_name="authors1",
        df2_name="authors2",
    )
    metrics = matches.get_metrics(GROUND_TRUTH)
    assert math.isclose(metrics["F1Score"], 1.0)
