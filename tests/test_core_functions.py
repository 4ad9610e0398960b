"""Unit tests for tokenizer / stemmer / fieldnorm / codec primitives."""

import numpy as np
import pytest

from pg_textsearch_spark.functions.stemmer import stem
from pg_textsearch_spark.functions.fieldnorm import (
    DECODE_TABLE, encode_fieldnorm, decode_fieldnorm, quantize_len,
)
from pg_textsearch_spark.functions.tokenizer import tokenize, tokenize_query
from pg_textsearch_spark.index.codec import (
    varbyte_encode, varbyte_decode, delta_encode_blocks, delta_decode_blocks,
)


# Known Snowball-English vectors (PG to_tsvector('english', ...) outputs).
STEM_VECTORS = {
    "hello": "hello",
    "world": "world",
    "goodbye": "goodby",
    "cruel": "cruel",
    "running": "run",
    "runner": "runner",
    "quickly": "quick",
    "databases": "databas",
    "flies": "fli",
    "dying": "die",
    "news": "news",
    "generate": "generat",
    "national": "nation",
    "nationally": "nation",
    "rational": "ration",
    "happily": "happili",
    "caresses": "caress",
    "ties": "tie",
    "cries": "cri",
    "skies": "sky",
    "early": "earli",
    "agreed": "agre",
    "feed": "feed",
    "conflated": "conflat",
    "hopping": "hop",
    "hoping": "hope",
    "sized": "size",
    "meetings": "meet",
    "exceed": "exceed",
    "communication": "communic",
    "consignment": "consign",
    "knitting": "knit",
    "apostrophe": "apostroph",
    "searches": "search",
    "indexing": "index",
    "documents": "document",
    "scoring": "score",
    "relevance": "relev",
}


def test_stemmer_vectors():
    errors = {w: (stem(w), want) for w, want in STEM_VECTORS.items() if stem(w) != want}
    assert not errors, errors


def test_fieldnorm_table_matches_reference_endpoints():
    # reference src/segment/fieldnorm.c: 0..39 exact, id 255 -> 2013265944
    assert list(DECODE_TABLE[:40]) == list(range(40))
    assert DECODE_TABLE[40:48].tolist() == [40, 42, 44, 46, 48, 50, 52, 54]
    assert DECODE_TABLE[48:56].tolist() == [56, 60, 64, 68, 72, 76, 80, 84]
    assert DECODE_TABLE[56] == 88
    assert DECODE_TABLE[255] == 2013265944
    assert np.all(np.diff(DECODE_TABLE) > 0)


def test_fieldnorm_roundtrip():
    lens = np.array([0, 1, 39, 40, 41, 55, 88, 89, 100, 5000, 10**9])
    codes = encode_fieldnorm(lens)
    decoded = decode_fieldnorm(codes)
    assert np.all(decoded <= lens)
    # encode = largest id with table value <= len
    for ln, c in zip(lens, codes):
        assert DECODE_TABLE[c] <= ln
        if c < 255:
            assert DECODE_TABLE[c + 1] > ln
    assert quantize_len([41])[0] == 40


def test_tokenize_simple_and_english():
    terms, tfs, dl = tokenize("Hello, hello WORLD!", config="simple")
    assert terms == ["hello", "world"] and tfs == [2, 1] and dl == 3
    terms, tfs, dl = tokenize("the quick brown foxes are running", config="english")
    assert "the" not in terms and "are" not in terms
    assert "fox" in terms and "run" in terms and "quick" in terms
    assert dl == sum(tfs) == 4
    assert tokenize(None)[2] == 0 and tokenize("")[2] == 0
    assert tokenize("...!!!")[0] == []


def test_tokenize_query_multiplicity():
    q = tokenize_query("world world hello", config="english")
    assert dict(q) == {"world": 2, "hello": 1}


def test_tokenize_scoring1_fixture():
    # reference test/sql/scoring1.sql corpus under english config
    t1, f1, d1 = tokenize("hello world", "english")
    t2, f2, d2 = tokenize("goodbye cruel world", "english")
    assert (t1, f1, d1) == (["hello", "world"], [1, 1], 2)
    assert (t2, f2, d2) == (["cruel", "goodby", "world"], [1, 1, 1], 3)


def test_tokenize_chunking_large_doc():
    word = "alpha "
    text = word * (300 * 1024 // len(word))  # > 256 KB
    terms, tfs, dl = tokenize(text, "simple")
    assert terms == ["alpha"]
    # tf caps at 256 PER CHUNK and merges across chunks => > 256
    assert tfs[0] > 256
    assert dl == tfs[0]


def test_tf_saturation():
    terms, tfs, dl = tokenize("x " * 1000, "simple")
    assert tfs == [256] and dl == 256


def test_varbyte_roundtrip():
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 2**40, size=10000).astype(np.uint64)
    vals[:100] = np.arange(100)
    enc = varbyte_encode(vals)
    dec = varbyte_decode(enc)
    assert np.array_equal(dec, vals)
    assert varbyte_decode(b"").size == 0
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""


def test_varbyte_partial_decode():
    vals = np.array([1, 300, 7, 2**30, 5], dtype=np.uint64)
    enc = varbyte_encode(vals)
    assert np.array_equal(varbyte_decode(enc, count=3), vals[:3])


def test_delta_blocks_roundtrip():
    rng = np.random.RandomState(3)
    ids = np.cumsum(rng.randint(1, 50, size=1000)).astype(np.int64)
    for bs in (128, 7, 1000, 1):
        deltas = delta_encode_blocks(ids, bs)
        back = delta_decode_blocks(deltas, bs)
        assert np.array_equal(back, ids), bs
    one = np.array([42], dtype=np.int64)
    assert np.array_equal(delta_decode_blocks(delta_encode_blocks(one)), one)
