"""Scoring fixtures 2-6 from the reference regression suite
(test/sql/scoring2.sql ... scoring6.sql; expected 4-dp scores backed out
of test/expected/scoring{2..6}.out, sign flipped — the reference's <@>
returns negative scores ordered ASC, this engine positive DESC).

Each fixture runs in the reference's two build modes:
- bulk:        one-shot Bm25Index.build over the full corpus
- incremental: build on the first doc, then append() one doc at a time
  (the memtable/L0 path), force_merge, and expect IDENTICAL scores.

Edge cases covered, per fixture: english stemming identity
('goodbyes'->'goodbye', scoring4), stopword-stripped doc lengths
(scoring2 avg_length=1.80, scoring3's 'a short sentence'), punctuation
tokenization (scoring6 'hello, world!'), score ties broken by id
(scoring2), and single-posting terms (scoring2 'domination')."""

import pytest

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.operators.exhaustive import score_exhaustive

ENG = Bm25Options(text_config="english")

# (docs, {query: [(id, score), ...]})  — reference expected output, 4 dp
FIXTURES = {
    "scoring2": (
        ["hello world", "goodbye world", "hello goodbye",
         "world domination", "hello"],
        {"hello": [(5, 0.6588), (1, 0.5156), (3, 0.5156)],
         "world": [(1, 0.5156), (2, 0.5156), (4, 0.5156)],
         "goodbye": [(2, 0.8374), (3, 0.8374)],
         "domination": [(4, 1.326)]},
    ),
    "scoring3": (
        ["the quick brown fox jumps over the lazy dog",
         "a short sentence",
         "this is a medium length sentence that contains several words"],
        {"quick": [(1, 0.8782)],
         "sentence": [(2, 0.6134), (3, 0.4208)]},
    ),
    "scoring4": (
        ["goodbye world", "goodbyes are hard"],
        {"goodbye": [(1, 0.1823), (2, 0.1823)]},
    ),
    "scoring5": (
        ["hello world", "goodbye cruel world", "goodbye nerds"],
        {"hello": [(1, 1.0417)],
         "cruel": [(2, 0.8782)],
         "world": [(1, 0.4992), (2, 0.4208)],
         "goodbye": [(3, 0.4992), (2, 0.4208)]},
    ),
    "scoring6": (
        ["hello, world!", "goodbye cruel world..."],
        {"hello": [(1, 0.7549)],
         "goodbye": [(2, 0.6407)],
         "world": [(1, 0.1986), (2, 0.1685)]},
    ),
}


def _df(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "id long, content string")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_exhaustive_matches_reference(spark, name):
    texts, queries = FIXTURES[name]
    df = _df(spark, texts)
    for q, want in queries.items():
        got = rows(score_exhaustive(spark, df, "content", "id", q, ENG))
        assert got == want, f"{name}/{q}"


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_bulk_index_matches_reference(spark, name, tmp_path):
    texts, queries = FIXTURES[name]
    idx = Bm25Index.build(spark, _df(spark, texts), "content",
                          str(tmp_path / name), id_col="id", opts=ENG,
                          num_segments=1)
    for q, want in queries.items():
        got = rows(idx.search(q, k="all"))
        assert got == want, f"{name}/{q} (bulk)"


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_incremental_index_matches_reference(spark, name, tmp_path):
    texts, queries = FIXTURES[name]
    df = _df(spark, texts)
    idx = Bm25Index.build(spark, df.filter("id = 1"), "content",
                          str(tmp_path / name), id_col="id", opts=ENG,
                          num_segments=1)
    for i in range(2, len(texts) + 1):
        idx.append(df.filter(f"id = {i}"), "content", "id")
    idx.force_merge()
    for q, want in queries.items():
        got = rows(idx.search(q, k="all"))
        assert got == want, f"{name}/{q} (incremental)"
