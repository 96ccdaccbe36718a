"""chunk_documents: window arithmetic, overlap reconstruction, edge cases."""

import pytest
from pyspark.sql import functions as F

from valentine_spark.operators import chunk_documents


def _chunks(spark, text, chunk=10, overlap=3):
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = chunk_documents(df, chunk_chars=chunk, overlap_chars=overlap)
    return [r["chunk_text"] for r in out.orderBy("chunk_id").collect()]


def test_window_arithmetic(spark):
    # L=10=chunk -> exactly one window; L=11 -> two (second is the tail)
    assert _chunks(spark, "abcdefghij") == ["abcdefghij"]
    assert _chunks(spark, "abcdefghijk") == ["abcdefghij", "hijk"]


def test_overlap_reconstruction(spark):
    """chunk0 + the non-overlapped suffix of every later chunk == document."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    chunk, overlap = 16, 5
    cs = _chunks(spark, text, chunk, overlap)
    rebuilt = cs[0] + "".join(c[overlap:] for c in cs[1:])
    assert rebuilt == text
    # adjacent windows genuinely share `overlap` characters
    for a, b in zip(cs, cs[1:]):
        assert a[-overlap:] == b[:overlap] or len(b) < overlap


def test_empty_and_null_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "xyz")], "doc_id int, text string"
    )
    out = chunk_documents(df, chunk_chars=10, overlap_chars=2)
    assert [(r["doc_id"], r["chunk_text"]) for r in out.collect()] == [(3, "xyz")]


def test_short_doc_single_chunk(spark):
    assert _chunks(spark, "ab", chunk=10, overlap=3) == ["ab"]


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "abc")], "doc_id int, text string")
    with pytest.raises(ValueError, match="smaller"):
        chunk_documents(df, chunk_chars=8, overlap_chars=8)


def test_chunk_count_formula(spark):
    # L=100, chunk=30, stride=20 -> 1 + ceil(70/20) = 5 windows
    text = "x" * 100
    cs = _chunks(spark, text, chunk=30, overlap=10)
    assert len(cs) == 5
    assert all(len(c) == 30 for c in cs[:-1]) and len(cs[-1]) == 20
