"""Multilingual (french/german/spanish) Snowball stemmers + text configs.

Ground truth: PostgreSQL's own Snowball dictionaries
(``ts_lexize('<lang>_stem', word)``) captured into
tests/data/stem_vectors_*.json by tools/gen_stem_vectors.py — ~750
vectors per language (curated inflections + deterministic fuzz covering
rare algorithm branches). A vector value of "" means PG treats the word
as a stopword of that config; those must appear in our stop lists.
"""

import json
import os

import pytest

from pg_textsearch_spark.functions.stemmer_intl import (
    stem_french, stem_german, stem_spanish)
from pg_textsearch_spark.functions.stopwords_intl import (
    FRENCH_STOPWORDS, GERMAN_STOPWORDS, SPANISH_STOPWORDS)
from pg_textsearch_spark.functions.tokenizer import resolve_config, tokenize

DATA = os.path.join(os.path.dirname(__file__), "data")

LANGS = {
    "french": (stem_french, FRENCH_STOPWORDS),
    "german": (stem_german, GERMAN_STOPWORDS),
    "spanish": (stem_spanish, SPANISH_STOPWORDS),
}


@pytest.mark.parametrize("lang", sorted(LANGS))
def test_vectors_match_postgres(lang):
    stem_fn, stopwords = LANGS[lang]
    with open(os.path.join(DATA, f"stem_vectors_{lang}.json"),
              encoding="utf-8") as f:
        vec = json.load(f)
    assert len(vec) > 700
    bad = []
    for word, want in vec.items():
        if not want:            # PG stop list filtered it
            if word not in stopwords:
                bad.append((word, "<not-a-stopword>", want))
            continue
        got = stem_fn(word)
        if got != want:
            bad.append((word, got, want))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_config_resolution():
    assert resolve_config("pg_catalog.english") == "english"
    assert resolve_config("french") == "french"
    with pytest.raises(ValueError):
        resolve_config("pg_catalog.nosuch")
    with pytest.raises(ValueError):
        resolve_config("klingon")


def test_tokenize_french_config():
    terms, tfs, dl = tokenize(
        "Les créations continuelles étaient majestueusement évidentes",
        config="french")
    # 'étaient' is a French stopword; 'les' is NOT (PG stop list) and
    # stems to 'le'; lexemes keep accents exactly as PG's dictionary does
    assert terms == ["continuel", "création", "le", "majestu", "évident"]
    assert dl == 5


def test_tokenize_german_config():
    terms, tfs, dl = tokenize(
        "Die Bedürfnisse der aufeinanderfolgenden Entwicklungen",
        config="german")
    # die/der are stopwords; umlauts fold (ü->u) in the stemmer postlude
    assert terms == ["aufeinanderfolg", "bedurfnis", "entwickl"]


def test_tokenize_spanish_config():
    terms, tfs, dl = tokenize(
        "Las organizaciones científicas estaban atravesándolos",
        config="spanish")
    # las/estaban are stopwords; acute accents fold in the postlude
    assert terms == ["atraves", "cientif", "organiz"]


def test_index_roundtrip_french(spark, tmp_path):
    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.index.build import Bm25Index
    docs = spark.createDataFrame(
        [(1, "les créations continuelles du système"),
         (2, "une création majestueuse"),
         (3, "rien à voir ici")],
        "id long, content string")
    idx = Bm25Index.build(spark, docs, "content", str(tmp_path / "fr"),
                          id_col="id",
                          opts=Bm25Options(text_config="french"),
                          num_segments=1)
    # the inflected query form 'créations' hits the same lexeme
    # 'création' as doc 2's singular
    got = {r["doc_id"] for r in idx.search("créations", k=10).collect()}
    assert got == {1, 2}
