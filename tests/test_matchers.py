"""Matcher integration tests on the authors fixture pair — the reference's
test strategy (``/root/reference/tests/test_algorithms.py``): every matcher
must produce sensible matches on the overlapping-instance pair, and the
instance matchers must rank the ground-truth column pairs on top."""

import math

import pytest

from valentine_spark import (
    Coma,
    Cupid,
    DistributionBased,
    JaccardDistanceMatcher,
    NotAValentineMatcher,
    SimilarityFlooding,
    StringDistanceFunction,
    valentine_match,
    valentine_match_batch,
)


def test_jaccard_exact(authors, ground_truth):
    df1, df2 = authors
    res = valentine_match(df1, df2, JaccardDistanceMatcher(distance_fun=StringDistanceFunction.Exact))
    assert len(res) > 0
    # identical shared columns must score 1.0
    for col in ("EID", "Authors", "Cited by"):
        assert math.isclose(res[(("table_1", col), ("table_2", col))], 1.0)
    metrics = res.get_metrics(ground_truth)
    assert metrics["Recall"] == 1.0


@pytest.mark.parametrize(
    "fun",
    [
        StringDistanceFunction.Levenshtein,
        StringDistanceFunction.DamerauLevenshtein,
        StringDistanceFunction.Hamming,
        StringDistanceFunction.Jaro,
        StringDistanceFunction.JaroWinkler,
    ],
)
def test_jaccard_distance_functions(authors, fun):
    df1, df2 = authors
    res = valentine_match(df1, df2, JaccardDistanceMatcher(distance_fun=fun))
    assert len(res) > 0
    assert all(0.0 < v <= 1.0 for v in res.values())
    # shared identical columns still match perfectly under any distance
    assert math.isclose(res[(("table_1", "Authors"), ("table_2", "Authors"))], 1.0)


def test_jaccard_fuzzy_asymmetry(spark):
    """Smaller distinct set is the probe side (ties -> target)."""
    import pandas as pd

    df1 = pd.DataFrame({"a": ["abc", "abd", "xyz", "abe"]})
    df2 = pd.DataFrame({"b": ["abc", "abd"]})
    res = valentine_match(
        spark.createDataFrame(df1),
        spark.createDataFrame(df2),
        JaccardDistanceMatcher(threshold_dist=0.6),
    )
    # probe = {abc, abd}: both have a fuzzy hit in df1's 4 values
    # inter = 2, union = 2 + 4 - 2
    assert math.isclose(res[(("table_1", "a"), ("table_2", "b"))], 2 / 4)


def test_distribution_based(authors, ground_truth):
    df1, df2 = authors
    res = valentine_match(df1, df2, DistributionBased())
    assert len(res) > 0
    metrics = res.get_metrics(ground_truth)
    assert metrics["RecallAtSizeofGroundTruth"] > 0.5


def test_similarity_flooding(authors):
    df1, df2 = authors
    res = valentine_match(df1, df2, SimilarityFlooding())
    assert len(res) > 0
    name_pairs = {(s[1], t[1]) for (s, t) in res.keys()}
    assert ("EID", "EID") in name_pairs


def test_cupid(authors):
    df1, df2 = authors
    res = valentine_match(df1, df2, Cupid())
    assert len(res) > 0
    for col in ("EID", "Authors", "Cited by"):
        assert (("table_1", col), ("table_2", col)) in res


def test_coma_raises(authors):
    df1, df2 = authors
    with pytest.raises(NotImplementedError):
        valentine_match(df1, df2, Coma())


def test_not_a_matcher(authors):
    df1, df2 = authors
    with pytest.raises(NotAValentineMatcher):
        valentine_match(df1, df2, JaccardDistanceMatcher)  # class, not instance


def test_valentine_match_batch(authors_pd):
    df1, df2 = authors_pd
    res = valentine_match_batch(
        iter([df1]),
        iter([df2]),
        JaccardDistanceMatcher(distance_fun=StringDistanceFunction.Exact),
        ["t1"],
        ["t2"],
    )
    assert len(res) > 0
    assert any(k[0][0] == "t1" and k[1][0] == "t2" for k in res)


def test_pandas_inputs_accepted(authors_pd):
    df1, df2 = authors_pd
    res = valentine_match(df1, df2, JaccardDistanceMatcher(distance_fun=StringDistanceFunction.Exact))
    assert len(res) > 0


@pytest.mark.parametrize("formula", ["basic", "formula_a", "formula_b", "formula_c"])
def test_similarity_flooding_formulas(authors, formula):
    df1, df2 = authors
    res = valentine_match(df1, df2, SimilarityFlooding(formula=formula))
    assert len(res) > 0
    assert all(v >= 0 for v in res.values())


def test_similarity_flooding_inverse_product(authors):
    df1, df2 = authors
    res = valentine_match(df1, df2, SimilarityFlooding(coeff_policy="inverse_product"))
    assert len(res) > 0
    name_pairs = {(s[1], t[1]) for (s, t) in res.keys()}
    assert ("EID", "EID") in name_pairs


def test_similarity_flooding_rejects_unknown(authors):
    df1, df2 = authors
    with pytest.raises(ValueError):
        valentine_match(df1, df2, SimilarityFlooding(formula="nope"))
    with pytest.raises(ValueError):
        valentine_match(df1, df2, SimilarityFlooding(coeff_policy="nope"))


def test_wordnet_lite_wu_palmer():
    """Bundled taxonomy: dictionary-word schema names get semantic
    similarity (the reference's WordNet path), identifier fragments fall
    back to Levenshtein (nan sentinel)."""
    import math

    from valentine_spark.functions.wordnet_lite import (
        all_lemma_names, synsets, word_similarity, wup_similarity,
    )

    assert word_similarity("author", "writer") == 1.0  # shared sense
    assert word_similarity("nation", "country") == 1.0  # synonyms
    assert 0.8 < word_similarity("price", "cost") < 1.0  # direct hypernym
    assert word_similarity("price", "author") < 0.3  # far apart
    assert math.isnan(word_similarity("eid", "price"))  # OOV -> fallback
    s = synsets("price")[0]
    assert wup_similarity(s, s) == 1.0
    assert "price" in all_lemma_names()


def test_cupid_wordnet_changes_dictionary_word_scores(spark):
    """The WordNet path actually fires: columns named with synonyms
    (price/cost) now match far above their Levenshtein-only score."""
    import valentine_spark as V
    from valentine_spark.matchers.cupid import _token_sim

    assert _token_sim("price", "cost") > 0.9  # levenshtein-only would be 0.2
    df1 = spark.createDataFrame([(1.0, "a")], "price double, name string")
    df2 = spark.createDataFrame([(2.0, "b")], "cost double, title string")
    res = V.valentine_match(df1, df2, V.Cupid(), "t1", "t2")
    assert res[(("t1", "price"), ("t2", "cost"))] > 0.7
