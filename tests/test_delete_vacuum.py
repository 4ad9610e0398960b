"""Deletion semantics (reference M4-M6, src/access/vacuum.c):
tombstoned docs disappear from results immediately; corpus stats keep dead
docs until a merge (alive bitset semantics); vacuum physically drops them
and then scores equal a fresh build over the survivors."""

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.index.delete import load_deletes
from pg_textsearch_spark.operators.exhaustive import score_exhaustive

ENG = Bm25Options(text_config="english")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def corpus(spark):
    def text(i):
        parts = ["alpha"]
        if i % 2 == 0:
            parts.append("beta")
        if i % 5 == 0:
            parts.append("gamma")
        if i % 20 == 0:
            parts.append("delta")
        return " ".join(parts) + f" filler{i % 7} doc {i}"
    return spark.createDataFrame([(i, text(i)) for i in range(1, 201)],
                                 "id long, content string")


def test_delete_masks_results_stats_unchanged(spark, corpus, tmp_path):
    idx = Bm25Index.build(spark, corpus, "content", str(tmp_path / "i1"),
                          id_col="id", opts=ENG, num_segments=3)
    before = rows(idx.search("gamma delta", k=20))
    victims = [d for d, _ in before[:3]]
    n_docs_before = idx.manifest.total_docs

    idx.delete(victims)
    after = rows(idx.search("gamma delta", k=20))
    got_ids = {d for d, _ in after}
    assert not got_ids & set(victims)
    # survivors keep their exact scores (stats still dead-inclusive, M4)
    surviving_before = [(d, s) for d, s in before if d not in victims]
    assert after[:len(surviving_before)] == surviving_before
    assert idx.manifest.total_docs == n_docs_before


def test_delete_then_and_phrase_modes(spark, corpus, tmp_path):
    opts = Bm25Options(text_config="english", store_positions=True)
    idx = Bm25Index.build(spark, corpus, "content", str(tmp_path / "i2"),
                          id_col="id", opts=opts, num_segments=2)
    base = rows(idx.search("alpha beta", k=10, mode="and"))
    victims = [base[0][0]]
    idx.delete(victims)
    after = rows(idx.search("alpha beta", k=10, mode="and"))
    assert victims[0] not in {d for d, _ in after}
    ph = rows(idx.search("alpha beta", k=10, mode="phrase"))
    assert victims[0] not in {d for d, _ in ph}


def test_vacuum_matches_fresh_build(spark, corpus, tmp_path):
    idx = Bm25Index.build(spark, corpus, "content", str(tmp_path / "i3"),
                          id_col="id", opts=ENG, num_segments=3)
    victims = [20, 40, 60, 80, 100]
    idx.delete(victims)
    report = idx.vacuum()
    assert report["docs_after"] == 195
    assert load_deletes(idx).size == 0

    survivors = corpus.filter(~F.col("id").isin(victims))
    fresh = Bm25Index.build(spark, survivors, "content", str(tmp_path / "i4"),
                            id_col="id", opts=ENG, num_segments=3)
    for q in ["gamma", "beta delta", "alpha beta gamma"]:
        assert rows(idx.search(q, k=15)) == rows(fresh.search(q, k=15)), q
    # docmap physically dropped the dead rows too
    assert idx.docmap().filter(F.col("doc_id").isin(victims)).count() == 0


def test_merge_drops_dead_docs(spark, corpus, tmp_path):
    idx = Bm25Index.build(spark, corpus, "content", str(tmp_path / "i5"),
                          id_col="id", opts=ENG, num_segments=4)
    idx.delete([1, 2, 3])
    idx.force_merge()
    assert idx.manifest.total_docs == 197
    got = {d for d, _ in rows(idx.search("alpha", k=None))}
    assert not got & {1, 2, 3}
