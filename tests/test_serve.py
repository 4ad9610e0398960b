"""Driver-local serving read path (index/serve.py): LocalSearcher must be
result-identical to the Spark query path on the same artifacts — or/and/
phrase modes, deletions, LSM appends (refresh), batches, LRU bounds."""

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.index.query import search_batch
from pg_textsearch_spark.index.serve import LocalSearcher

OPTS = Bm25Options(text_config="english", store_positions=True)

WORDS = ["quick", "brown", "fox", "jumps", "lazy", "dog", "river", "stone",
         "cloud", "ember"]


def _text(i):
    parts = [WORDS[(i * 7 + j * 3) % len(WORDS)] for j in range(3 + i % 9)]
    if i % 11 == 0:
        parts += ["quick", "brown", "fox"]
    if i % 4 == 0:
        parts += ["lazy", "dog"]
    return " ".join(parts) + f" doc {i}"


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([(i, _text(i)) for i in range(1, 401)],
                                 "id long, content string")


@pytest.fixture(scope="module")
def idx(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serve") / "idx")
    return Bm25Index.build(spark, corpus, "content", path, id_col="id",
                           opts=OPTS, num_segments=4)


def spark_rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def serve_rows(pdf):
    return list(zip(pdf["doc_id"].tolist(), pdf["score"].tolist()))


QUERIES = ["quick", "quick brown fox", "lazy dog river", "ember cloud",
           "quick quick brown", "nosuchterm", "doc stone"]


def test_serve_matches_spark_or(idx):
    srv = LocalSearcher(idx.path)
    for q in QUERIES:
        assert serve_rows(srv.search(q, k=10)) == \
            spark_rows(idx.search(q, k=10)), q


def test_serve_matches_spark_and_phrase(idx):
    srv = idx.serving()
    for q in ["quick brown fox", "lazy dog"]:
        assert serve_rows(srv.search(q, k=10, mode="and")) == \
            spark_rows(idx.search(q, k=10, mode="and")), q
        assert serve_rows(srv.search(q, k=10, mode="phrase")) == \
            spark_rows(idx.search(q, k=10, mode="phrase")), q


def test_serve_k_all_and_empty(idx):
    srv = idx.serving()
    assert serve_rows(srv.search("quick brown", k=None)) == \
        spark_rows(idx.search("quick brown", k=None))
    assert serve_rows(srv.search("quick", k="all")) == \
        spark_rows(idx.search("quick", k="all"))
    assert len(srv.search("", k=10)) == 0


def test_serve_batch_matches_spark(idx):
    srv = idx.serving()
    qs = ["quick brown", "lazy dog river", "stone", "nosuchterm", "fox ember"]
    got = srv.search_batch(qs, k=5)
    want = search_batch(idx, qs, k=5).toPandas()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_serve_lru_bound_still_correct(idx):
    srv = LocalSearcher(idx.path, cache_terms=1)
    a = serve_rows(srv.search("quick brown fox", k=10))
    b = serve_rows(srv.search("lazy dog", k=10))
    assert a == spark_rows(idx.search("quick brown fox", k=10))
    assert b == spark_rows(idx.search("lazy dog", k=10))
    # re-query after eviction
    assert serve_rows(srv.search("quick brown fox", k=10)) == a
    assert len(srv._terms) <= 1


def test_serve_sees_deletes_and_appends(spark, corpus, tmp_path):
    path = str(tmp_path / "idx")
    idx = Bm25Index.build(spark, corpus, "content", path, id_col="id",
                          opts=OPTS, num_segments=3)
    srv = idx.serving()
    before = srv.search("quick brown", k=5)
    victims = before["doc_id"].tolist()[:2]
    idx.delete(victims)
    after = srv.search("quick brown", k=5)   # tombstones, no manifest change
    assert not set(victims) & set(after["doc_id"].tolist())
    assert serve_rows(after) == spark_rows(idx.search("quick brown", k=5))

    extra = spark.createDataFrame(
        [(1000 + i, "quick brown fox quick brown fox") for i in range(5)],
        "id long, content string")
    idx.append(extra, "content", "id")       # manifest change -> refresh
    got = srv.search("quick brown fox", k=10)
    assert serve_rows(got) == spark_rows(idx.search("quick brown fox", k=10))


def test_serve_resolve_matches_spark(spark, corpus, tmp_path):
    from pg_textsearch_spark.config import Bm25Options
    path = str(tmp_path / "idx")
    idx = Bm25Index.build(spark, corpus, "content", path, id_col="id",
                          opts=Bm25Options(text_config="english",
                                           reorder_docs="length"),
                          num_segments=3)
    srv = idx.serving()
    got = srv.resolve(srv.search("quick brown fox", k=10))
    want = idx.resolve(idx.search("quick brown fox", k=10)).toPandas()
    assert list(zip(got["source_id"], got["score"])) == \
        list(zip(want["source_id"], want["score"]))
    # identity-layout build: source_id == doc_id synthesized
    plain = Bm25Index.build(spark, corpus, "content", str(tmp_path / "idx2"),
                            id_col="id", opts=OPTS, num_segments=2)
    s2 = plain.serving()
    r = s2.resolve(s2.search("quick", k=5))
    assert (r["source_id"] == r["doc_id"]).all()


def test_threshold_seeding_skips_and_preserves_results(idx):
    from pg_textsearch_spark.index.query import make_segment_kernel
    srv = idx.serving()
    q = "quick brown fox"
    want = serve_rows(srv.search(q, k=10))
    # a seeded kth above any achievable score makes every segment return
    # empty WITHOUT decoding (the whole-segment skip in _run_maxscore)
    opts = srv.manifest.opts
    from pg_textsearch_spark.functions.tokenizer import tokenize_query
    qf = {t: float(f) for t, f in tokenize_query(q, opts.text_config)}
    rows, gdf = srv._fetch(list(qf))
    kernel = make_segment_kernel(
        qf, srv.manifest.total_docs, 10, opts,
        max(srv.manifest.avgdl, 1e-9), "or", None,
        static_df=gdf, shared_topk={"kth": 1e9})
    for seg_id, rs in srv._by_segment(rows).items():
        uniq, _ = kernel((seg_id,), rs)
        assert uniq.size == 0
    # and the real sequential loop (which seeds with the RUNNING kth)
    # still returns exactly the Spark path's results
    assert serve_rows(srv.search(q, k=10)) == want == \
        spark_rows(idx.search(q, k=10))


def test_ann_serving_matches_spark(spark, tmp_path):
    from pg_textsearch_spark.operators import similarity
    embs = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    path = str(tmp_path / "ivf")
    art = similarity.IvfIndex.build(spark, embs, path,
                                    n_centroids=8, n_iters=2)
    srv = art.serving()
    qids = [0, 3, 7, 11]
    want = art.search_ids(qids, k=5, nprobe=2).toPandas()
    got = srv.search_ids(qids, k=5, nprobe=2)
    assert list(map(tuple, got.values.tolist())) == \
        list(map(tuple, want.values.tolist()))
    # deletes are respected without reopening
    art.delete([int(want["vec_id"].iloc[0])])
    want2 = art.search_ids(qids, k=5, nprobe=2).toPandas()
    got2 = srv.search_ids(qids, k=5, nprobe=2)
    assert list(map(tuple, got2.values.tolist())) == \
        list(map(tuple, want2.values.tolist()))
    # arbitrary-vector entry point returns the same neighbors as an
    # id-keyed search for that id's own stored vector
    import numpy as np
    ids, mat, nrm = srv._bucket(srv._id_bucket[qids[0]])
    pos = int(np.searchsorted(ids, qids[0]))
    v = srv.search_vector(mat[pos], k=5, nprobe=2, exclude_ids=tuple(qids))
    one = got2[got2["query_id"] == qids[0]]
    assert v["vec_id"].tolist() == one["vec_id"].tolist()


def test_seeded_threshold_skips_cold_segments(spark, tmp_path):
    # doc-range segments (no reorder): docs 1-100 are term-heavy, docs
    # 301-400 mention the term once in long docs — once segment 1 banks
    # k docs, later segments' bounds fall short and skip entirely
    rows = [(i, "rare " * 8 + "filler") for i in range(1, 101)]
    rows += [(i, "rare " + "pad " * 40) for i in range(301, 401)]
    docs = spark.createDataFrame(rows, "id long, content string")
    idx = Bm25Index.build(spark, docs, "content", str(tmp_path / "idx"),
                          id_col="id",
                          opts=Bm25Options(text_config="simple"),
                          num_segments=4)
    srv = idx.serving()
    got = srv.search("rare", k=10)
    assert srv.last_stats["segments_skipped"] >= 1, srv.last_stats
    assert serve_rows(got) == spark_rows(idx.search("rare", k=10))


def test_serve_batch_per_query_seeding_identical(idx):
    srv = idx.serving()
    qs = ["quick brown", "lazy dog river", "stone", "nosuchterm", "fox ember"]
    a = srv.search_batch(qs, k=5)
    b = srv.search_batch(qs, k=5, per_query_seeding=True)
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_partitioned_serving_matches_spark(spark, tmp_path):
    from pg_textsearch_spark.index.partitioned import PartitionedBm25Index
    rows = [(i, "alpha beta gamma common words here", "big")
            for i in range(200)]
    rows += [(1000 + i, "alpha rare partition doc", "tiny") for i in range(6)]
    docs = spark.createDataFrame(rows, "id long, content string, part string")
    pidx = PartitionedBm25Index.build(
        spark, docs, "content", str(tmp_path / "p"), "part",
        id_col="id", opts=Bm25Options(text_config="simple"), num_segments=2)
    srv = pidx.serving()
    for kwargs in ({"partitions": ["tiny"]}, {}, {"k": 4}):
        got = srv.search("alpha rare", k=kwargs.pop("k", 5), **kwargs)
        want = pidx.search("alpha rare", k=len(got), **kwargs).toPandas()
        gset = set(map(tuple, got[["doc_id", "score"]].values.tolist()))
        wset = set(map(tuple, want[["doc_id", "score"]].values.tolist()))
        assert gset == wset, kwargs
    import pytest as _pytest
    with _pytest.raises(ValueError):
        srv.search("alpha", partitions=["nope"])
