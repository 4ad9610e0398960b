"""Property-based engine check (hypothesis): on randomized small corpora
and randomized queries, the INDEX path (segment build -> MaxScore/block-max
kernel) must return exactly what the EXHAUSTIVE scorer (the reference's
`<@>` projection analogue, independent dataflow: per-posting join, no
segments, no pruning) returns — same docs, same 4-dp scores, same tie
order — across or/and modes, both codecs, and multi-segment layouts.

This is the same oracle relationship the reference uses in
test/sql/validation.sql:207-212 (index scan == standalone scoring),
generalized over random inputs instead of fixtures."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from pg_textsearch_spark.config import Bm25Options  # noqa: E402
from pg_textsearch_spark.index.build import Bm25Index  # noqa: E402
from pg_textsearch_spark.operators.exhaustive import score_exhaustive  # noqa: E402

# tiny vocab on purpose: forces shared terms, score ties, repeated tokens,
# stopwords ("the", "and"), and empty-after-tokenize docs
VOCAB = ["the", "and", "merge", "hash", "join", "scan", "x1", "x1", "zz"]
DOC = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=30)
CORPUS = st.lists(DOC, min_size=1, max_size=40)
QUERY = st.lists(st.sampled_from(VOCAB + ["missing"]), min_size=1,
                 max_size=4)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(corpus=CORPUS, query=QUERY,
       cfg=st.sampled_from(["simple", "english"]),
       codec=st.sampled_from(["varbyte", "bitpack"]),
       mode=st.sampled_from(["or", "and", "phrase"]),
       segs=st.integers(min_value=1, max_value=3))
def test_index_matches_exhaustive(spark, tmp_path_factory, corpus, query,
                                  cfg, codec, mode, segs):
    docs = spark.createDataFrame(
        [(i + 1, " ".join(words)) for i, words in enumerate(corpus)],
        "doc_id long, text string")
    opts = Bm25Options(text_config=cfg, posting_codec=codec,
                       store_positions=(mode == "phrase"))
    q = " ".join(query)

    want = [(r["doc_id"], r["score"]) for r in score_exhaustive(
        spark, docs, "text", "doc_id", q, opts, k=10, mode=mode).collect()]

    path = str(tmp_path_factory.mktemp("prop") / "idx")
    try:
        idx = Bm25Index.build(spark, docs, "text", path, id_col="doc_id",
                              opts=opts, num_segments=segs)
    except ValueError as e:
        # every doc tokenized to nothing (stopword-only corpus): build
        # refuses an empty index; the exhaustive scorer must agree
        assert "empty" in str(e)
        assert want == []
        return
    got = [(r["doc_id"], r["score"])
           for r in idx.search(q, k=10, mode=mode).collect()]
    assert got == want, (q, cfg, codec, mode, segs)

    # the driver-local serving path (index/serve.py: pyarrow reads,
    # list-input kernels, cross-segment threshold seeding) must agree too
    served = idx.serving().search(q, k=10, mode=mode)
    assert list(zip(served["doc_id"], served["score"])) == want, \
        ("serve", q, cfg, codec, mode, segs)
