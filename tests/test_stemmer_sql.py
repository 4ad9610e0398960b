"""SQL Porter2 stemmer parity: the chained-CTE DuckDB implementation must
stem every token exactly like the engine's Python stemmer (stemmer.py), so
the english-config oracle shares the tokenizer with the engine the way the
reference oracle shares to_tsvector (test/sql/validation.sql:1-12)."""

import itertools
import os
import re

import duckdb
import pytest

from pg_textsearch_spark.functions.stemmer import stem
from pg_textsearch_spark.functions.stemmer_sql import stem_cte_sql

ROOTS = ["consol", "rat", "hop", "tan", "beat", "bell", "free", "fre",
         "gener", "commun", "arsen", "luxuri", "nation", "sens", "decid",
         "activ", "electr", "y", "cry", "stay", "toy"]
SUFFIXES = ["", "e", "s", "es", "ed", "eed", "eedly", "ing", "ingly",
            "edly", "ation", "ization", "iveness", "fulness", "ousness",
            "biliti", "entli", "ousli", "alli", "bli", "li", "ogi", "logi",
            "ical", "icate", "ative", "alize", "iciti", "ful", "ness",
            "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
            "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic",
            "ion", "tion", "sion", "ll", "y", "ey", "ied", "ies", "sses",
            "us", "ss"]
SPECIALS = """skis skies dying lying tying idly gently ugly early only
singly sky news howe atlas cosmos bias andes inning outing canning herring
earring proceed exceed succeed merge merging merged windows hashing joined
agreed agreement feed bled luxuriated hopping hoped tanned crying cried
denied cities city national rational conditional vietnamization operator
feudalism decisiveness formaliti sensitiviti triplicate formative
electriciti hopeful goodness adjustable defensible irritant replacement
adoption communism activate effective bowdlerize allowance inference
airliner gyroscopic steadili sympathize mesmerize archaeology rarely
knightly abbey aberrant abilities ability ably abnormally yellow yield
young youth sprayed played conveyed obeyed die lie tie dies vies vying
shoes does goes ing ed s a ab fluently obviously luckily kindly briefly
sses misses kisses""".split()


def _wordlist():
    words = set(SPECIALS)
    for r, s in itertools.product(ROOTS, SUFFIXES):
        words.add(r + s)
    return sorted(w for w in words if w and re.fullmatch(r"[a-z0-9_]+", w))


def test_sql_stemmer_matches_python():
    words = _wordlist()
    con = duckdb.connect()
    con.execute("CREATE TABLE toks(term VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?)", [(w,) for w in words])
    sql = "WITH " + stem_cte_sql() + " SELECT term, lexeme FROM stems"
    got = dict(con.execute(sql).fetchall())
    bad = [(w, got.get(w), stem(w)) for w in words if got.get(w) != stem(w)]
    assert not bad, f"{len(bad)} mismatches, first 10: {bad[:10]}"


def test_sql_stemmer_matches_python_on_corpus_vocab():
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    doc_path = os.path.join(sf, "documents.parquet")
    if not os.path.exists(doc_path):
        pytest.skip("no testdata")
    con = duckdb.connect()
    con.execute(f"""CREATE TABLE toks AS
        SELECT DISTINCT unnest(regexp_extract_all(lower(text),
                               '[a-z0-9_]+')) AS term
        FROM '{doc_path}'""")
    sql = "WITH " + stem_cte_sql() + " SELECT term, lexeme FROM stems"
    got = dict(con.execute(sql).fetchall())
    assert got, "empty vocabulary"
    bad = [(w, g, stem(w)) for w, g in got.items() if g != stem(w)]
    assert not bad, bad[:10]
