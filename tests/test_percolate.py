"""Standing-query percolation: scores must equal the exhaustive scorer
(per query, same frozen-stats convention), index-frozen stats must match
corpus-frozen stats on the same corpus, and the streaming form must
reproduce the batch results exactly (stateless append mode)."""

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.operators.exhaustive import score_exhaustive
from pg_textsearch_spark.streaming.percolate import Percolator

QUERIES = ["merge", "hash join", "window customer merge"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")


def _as_map(rows):
    return {(r["query_id"], r["doc_id"]): r["score"] for r in rows}


def test_matches_equal_exhaustive_per_query(spark, docs):
    opts = Bm25Options(text_config="simple")
    perc = Percolator.from_corpus(spark, docs, QUERIES, opts=opts)
    got = _as_map(perc.matches(docs).collect())
    want = {}
    for qid, q in enumerate(QUERIES):
        for r in score_exhaustive(spark, docs, "text", "doc_id", q,
                                  opts=opts, k=None).collect():
            want[(qid, r["doc_id"])] = r["score"]
    assert got == want


def test_index_frozen_stats_match_corpus(spark, docs, tmp_path):
    from pg_textsearch_spark.index.build import Bm25Index
    opts = Bm25Options(text_config="simple")
    idx = Bm25Index.build(spark, docs, "text", str(tmp_path / "idx"),
                          id_col="doc_id", opts=opts)
    p_idx = Percolator.from_index(idx, QUERIES)
    p_cor = Percolator.from_corpus(spark, docs, QUERIES, opts=opts)
    assert p_idx.n_docs == p_cor.n_docs
    assert p_idx.avgdl == pytest.approx(p_cor.avgdl)
    got = _as_map(p_idx.matches(docs, min_score=1.0).collect())
    want = _as_map(p_cor.matches(docs, min_score=1.0).collect())
    assert got == want and got


def test_and_mode_and_threshold(spark, docs):
    opts = Bm25Options(text_config="simple")
    perc = Percolator.from_corpus(spark, docs, ["window customer"],
                                  opts=opts)
    both = _as_map(perc.matches(docs, mode="and").collect())
    want = {(0, r["doc_id"]): r["score"]
            for r in score_exhaustive(spark, docs, "text", "doc_id",
                                      "window customer", opts=opts,
                                      k=None, mode="and").collect()}
    assert both == want and both
    # threshold prunes: every surviving score clears it, and something
    # was actually dropped
    thr = sorted(both.values())[len(both) // 2]
    kept = _as_map(perc.matches(docs, mode="and", min_score=thr).collect())
    assert kept and len(kept) < len(both)
    assert all(s >= thr for s in kept.values())


def test_streaming_parity(spark, docs, tmp_path):
    """matches() over a file-source stream == batch matches(): the plan is
    stateless, so append mode needs no watermark and emits every match in
    the first trigger."""
    opts = Bm25Options(text_config="simple")
    perc = Percolator.from_corpus(spark, docs, QUERIES, opts=opts)
    batch = _as_map(perc.matches(docs, min_score=1.0).collect())

    src = str(tmp_path / "src")
    docs.coalesce(2).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = perc.matches(stream, min_score=1.0)
    assert out.isStreaming
    q = (out.writeStream.format("memory").queryName("perc_par")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = _as_map(spark.sql("select * from perc_par").collect())
    assert got == batch and got


def test_inverted_path_equals_nlj_path(spark, docs):
    """matches_inverted (the large-K scale path) must reproduce matches()
    exactly — same pairs, same rounded scores — in both modes, and must
    refuse streaming input (its aggregate needs a shuffle)."""
    opts = Bm25Options(text_config="simple")
    perc = Percolator.from_corpus(spark, docs, QUERIES, opts=opts)
    for mode in ("or", "and"):
        a = _as_map(perc.matches(docs, mode=mode, min_score=1.0).collect())
        b = _as_map(perc.matches_inverted(
            docs, mode=mode, min_score=1.0).collect())
        assert a == b and a

    stream = (spark.readStream.schema(docs.schema)
              .parquet("/root/testdata/sf0.001"))
    with pytest.raises(ValueError, match="batch-only"):
        perc.matches_inverted(stream)


def test_match_doc_equals_spark_matches(spark, docs):
    opts = Bm25Options(text_config="simple")
    perc = Percolator.from_corpus(spark, docs, QUERIES, opts=opts)
    spark_all = _as_map(
        perc.matches(docs.limit(8), min_score=0.0).collect())
    rows = docs.limit(8).collect()
    for r in rows:
        got = perc.match_doc(r["text"])
        want = sorted(((qid, s) for (qid, did), s in spark_all.items()
                       if did == r["doc_id"]), key=lambda x: (-x[1], x[0]))
        assert got == want, r["doc_id"]
    # and/min_score parity on one doc
    r = rows[0]
    got = perc.match_doc(r["text"], mode="and", min_score=0.5)
    spark_and = _as_map(
        perc.matches(docs.filter(F.col("doc_id") == r["doc_id"]),
                     mode="and", min_score=0.5).collect())
    want = sorted(((qid, s) for (qid, _), s in spark_and.items()),
                  key=lambda x: (-x[1], x[0]))
    assert got == want


def test_lifecycle_add_remove_matches_fresh_set(spark, docs):
    """add_queries/remove_queries mutate the standing set without
    refreezing corpus stats: results equal a percolator built fresh with
    the same live queries at the same positions (ids are stable), and an
    added query with vocabulary unseen by the base set gets its df
    resolved through the stats source (df_lookup)."""
    opts = Bm25Options(text_config="simple")
    base = ["merge", "hash join", "window customer merge"]
    p1 = Percolator.from_corpus(spark, docs, base, opts=opts)
    # 'vector' / 'zebra' appear in no base query -> unseen-term df path
    new_ids = p1.add_queries(["vector scan", "zebra merge batch"])
    assert new_ids == [3, 4]
    assert p1.remove_queries([1]) == 1
    assert p1.remove_queries([1, 99]) == 0      # already gone / bogus

    fresh = Percolator.from_corpus(
        spark, docs, base + ["vector scan", "zebra merge batch"], opts=opts)
    got = _as_map(p1.matches(docs).collect())
    want = {k: v for k, v in
            _as_map(fresh.matches(docs).collect()).items()
            if k[0] != 1}
    assert got == want
    # driver-side serving twin follows the same lifecycle
    text = docs.filter(F.col("doc_id") == 0).first()["text"]
    assert p1.match_doc(text) == [
        (qid, sc) for qid, sc in fresh.match_doc(text) if qid != 1]


def test_lifecycle_add_after_remove_never_reuses_ids(spark, docs):
    opts = Bm25Options(text_config="simple")
    p = Percolator.from_corpus(spark, docs, ["merge"], opts=opts)
    p.remove_queries([0])
    assert p.add_queries(["hash"]) == [1]
    live = {r["query_id"] for r in p.matches(docs).collect()}
    assert live <= {1}


def test_largek_inverted_at_design_point(spark, docs):
    """>=1k standing queries through the inverted-query-index path (its
    design regime: O(matching postings) + one matched-pair shuffle) must
    reproduce the O(docs x K) broadcast-NLJ rows exactly."""
    opts = Bm25Options(text_config="simple")
    vocab = sorted({t for r in docs.select("text").collect()
                    for t in r["text"].lower().split()})
    fleet = [f"{a} {b}" for a in vocab for b in vocab]
    fleet += list(vocab)
    fleet += [f"{a} {b} {a}" for a in vocab[:8] for b in vocab[:8]]
    assert len(fleet) >= 1000
    perc = Percolator.from_corpus(spark, docs, fleet, opts=opts)
    sub = docs.filter(F.col("doc_id") < 40)
    inv = _as_map(perc.matches_inverted(sub, min_score=2.0).collect())
    nlj = _as_map(perc.matches(sub, min_score=2.0).collect())
    assert inv == nlj
    assert len(inv) > 0
