"""Rank-identity of the exhaustive scorer against the reference's own
regression fixtures (scores back out of test/expected/*.out, 4 dp)."""

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.operators.exhaustive import score_exhaustive, idf_value

ENG = Bm25Options(text_config="english")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def scoring1(spark):
    # reference test/sql/scoring1.sql:20-22
    return spark.createDataFrame(
        [(1, "hello world"), (2, "goodbye cruel world")], "id long, content string")


def test_scoring1_hello(spark, scoring1):
    # expected: doc 1 score 0.7549 (test/expected/scoring1.out, sign flipped)
    got = rows(score_exhaustive(spark, scoring1, "content", "id", "hello", ENG))
    assert got == [(1, 0.7549)]


def test_scoring1_cruel(spark, scoring1):
    got = rows(score_exhaustive(spark, scoring1, "content", "id", "cruel", ENG))
    assert got == [(2, 0.6407)]


def test_scoring1_world_matches_both(spark, scoring1):
    got = rows(score_exhaustive(spark, scoring1, "content", "id", "world", ENG))
    # df=2 -> idf = ln(1 + 0.5/2.5) = ln(1.2); doc1 dl=2, doc2 dl=3; avgdl=2.5
    import math
    idf = math.log(1.2)
    s1 = idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.5))
    s2 = idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    assert got == [(1, round(s1, 4)), (2, round(s2, 4))]


def test_query_freq_multiplies(spark, scoring1):
    one = rows(score_exhaustive(spark, scoring1, "content", "id", "hello", ENG))
    two = rows(score_exhaustive(spark, scoring1, "content", "id", "hello hello", ENG))
    assert two[0][1] == pytest.approx(2 * one[0][1], abs=2e-4)


def test_stopwords_ignored(spark, scoring1):
    got = rows(score_exhaustive(spark, scoring1, "content", "id", "the hello", ENG))
    base = rows(score_exhaustive(spark, scoring1, "content", "id", "hello", ENG))
    assert got == base


def test_no_match(spark, scoring1):
    assert rows(score_exhaustive(spark, scoring1, "content", "id", "zzz", ENG)) == []
    assert rows(score_exhaustive(spark, scoring1, "content", "id", "the", ENG)) == []


@pytest.fixture(scope="module")
def wand_corpus(spark):
    # reference test/sql/wand.sql:18-42 (F2 in FIXTURES.md): 206 docs
    rows_ = [(i, f"alpha only {i}") for i in range(1, 6)]
    rows_.append((6, "alpha beta both terms here"))
    rows_ += [(i, f"beta only {i}") for i in range(7, 207)]
    return spark.createDataFrame(rows_, "id long, content string")


def test_wand_corpus_multi_term_topk(spark, wand_corpus):
    got = rows(score_exhaustive(spark, wand_corpus, "content", "id",
                                "alpha beta", ENG, k=10))
    # 'only' is a stopword -> alpha-only docs have dl=2 vs doc 6's dl=3, so
    # docs 1-5 outrank doc 6; doc 6 (the only both-terms doc) must still be
    # 6th, strictly above every beta-only doc (the reference's wand.sql
    # block-boundary check is exactly "doc 6 is not lost").
    assert [d for d, _ in got[:6]] == [1, 2, 3, 4, 5, 6]
    assert got[4][1] == got[0][1]  # docs 1-5 tie, ordered by doc_id
    assert got[5][1] > got[6][1]
    assert len(got) == 10


def test_and_mode(spark, wand_corpus):
    got = rows(score_exhaustive(spark, wand_corpus, "content", "id",
                                "alpha beta", ENG, mode="and"))
    assert [d for d, _ in got] == [6]


def test_phrase_mode(spark):
    df = spark.createDataFrame(
        [(1, "spark batch engine"), (2, "batch spark engine"),
         (3, "the spark batch engine"), (4, "spark the batch")],
        "id long, content string")
    got = rows(score_exhaustive(spark, df, "content", "id",
                                "spark batch", ENG, mode="phrase"))
    assert sorted(d for d, _ in got) == [1, 3]


def test_idf_always_nonnegative():
    assert idf_value(1, 1) >= 0
    assert idf_value(10, 10) >= 0
    assert idf_value(1000, 1) > idf_value(1000, 999)
