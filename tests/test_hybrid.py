"""Hybrid BM25 + vector RRF fusion (operators/hybrid.py)."""

import duckdb
import pytest

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.operators import hybrid


def test_rrf_fuse_math_and_missing_ranks(spark):
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, bm25_rank long")
    b = spark.createDataFrame(
        [(2, 1), (4, 2)], "doc_id long, cos_rank long")
    rows = {r["doc_id"]: r for r in
            hybrid.rrf_fuse(a, b, k=10, rrf_k=60).collect()}
    # doc 2 is in both lists: 1/62 + 1/61
    assert rows[2]["rrf_score"] == pytest.approx(
        round(1 / 62 + 1 / 61, 6), abs=1e-9)
    assert (rows[2]["bm25_rank"], rows[2]["cos_rank"]) == (2, 1)
    # one-sided docs: absent rank surfaces as 0, contributes nothing
    assert rows[1]["cos_rank"] == 0
    assert rows[1]["rrf_score"] == pytest.approx(round(1 / 61, 6), abs=1e-9)
    assert rows[4]["bm25_rank"] == 0
    # both-lists doc outranks every single-list doc here
    order = [r["doc_id"] for r in sorted(rows.values(),
                                         key=lambda r: -r["rrf_score"])]
    assert order[0] == 2


def test_hybrid_rrf_matches_duckdb_twin(spark):
    # tiny aligned corpus: doc text drives BM25, embedding drives cosine;
    # doc 0 is the seed (query_vec_id) and also matches the text query
    docs = spark.createDataFrame(
        [(0, "spark shuffle join"), (1, "spark join"), (2, "window sort"),
         (3, "join join join"), (4, "nothing relevant here")],
        "doc_id long, text string")
    embs = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.9, 0.1, 0.0]), (2, [0.0, 1.0, 0.0]),
         (3, [0.5, 0.5, 0.0]), (4, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")
    got = hybrid.hybrid_rrf(
        spark, docs, embs, "spark join", 0, k=5, n_candidates=4,
        opts=Bm25Options(text_config="simple")).toPandas()
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    con.register("embeddings", embs.toPandas())
    want = con.sql(hybrid.hybrid_rrf_oracle_sql(
        "spark join", 0, k=5, n_candidates=4, dim=3)).df()
    assert got.columns.tolist() == want.columns.tolist()
    assert got.astype("float64").reset_index(drop=True).equals(
        want.astype("float64").reset_index(drop=True))
    # the seed doc tops both lists -> tops the fusion
    assert int(got.iloc[0]["doc_id"]) == 0


def test_hybrid_rrf_composes_with_index_paths(spark, tmp_path):
    """rrf_fuse is the composition point: feed it the SEGMENT-INDEX BM25
    ranking (not the exhaustive scorer) and a vector ranking — the fused
    output must equal the exhaustive-path hybrid on the same data."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from pg_textsearch_spark.index.build import Bm25Index
    from pg_textsearch_spark.operators.similarity import (_dot_col,
                                                          _with_norm)
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} " + "join " * (i % 3)) for i in range(20)],
        "doc_id long, text string")
    embs = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 7), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>")
    opts = Bm25Options(text_config="simple", docs_per_segment=8)
    idx = Bm25Index.build(spark, docs, "text", str(tmp_path / "idx"),
                          id_col="doc_id", opts=opts)
    bm = idx.search("alpha join", k=10)
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_ranked = bm.withColumn("bm25_rank", F.row_number().over(wb))

    base = _with_norm(embs, "embedding", "vec_id")
    q = base.filter(F.col("vec_id") == 1) \
            .select(F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    cos = _dot_col(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    wc = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    cs_ranked = (base.crossJoin(F.broadcast(q))
                 .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
                 .withColumn("cos_rank", F.row_number().over(wc))
                 .filter(F.col("cos_rank") <= 10))

    fused_idx = hybrid.rrf_fuse(bm_ranked, cs_ranked, k=5).collect()
    fused_exh = hybrid.hybrid_rrf(spark, docs, embs, "alpha join", 1,
                                  k=5, n_candidates=10, opts=opts).collect()
    assert [tuple(r) for r in fused_idx] == [tuple(r) for r in fused_exh]


def test_hybrid_serve_matches_spark_scale_path(spark, tmp_path):
    """The driver-local hybrid (LocalSearcher + LocalAnnSearcher fused in
    plain Python) must reproduce the Spark hybrid_scale_rrf rows exactly
    — same artifacts, same ranks, same fusion."""
    from pyspark.sql import functions as F
    from pg_textsearch_spark.index.build import Bm25Index
    from pg_textsearch_spark.operators.similarity import IvfIndex

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    opts = Bm25Options(text_config="simple", docs_per_segment=200)
    idx = Bm25Index.build(spark, docs, "text", str(tmp_path / "idx"),
                          id_col="doc_id", opts=opts)
    ivf = IvfIndex.build(spark, embs, str(tmp_path / "ivf"),
                         n_centroids=8, n_iters=2)
    seed = 3
    want = hybrid.hybrid_scale_rrf(idx, ivf, "hash join merge", seed,
                                   k=10, n_candidates=30).toPandas()

    srv = idx.serving()
    ann = ivf.serving()
    qvec = embs.filter(F.col("vec_id") == seed).first()["embedding"]
    got = hybrid.hybrid_serve(srv, ann, "hash join merge", qvec,
                              k=10, n_candidates=30, exclude_ids=(seed,))
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["rrf_score"].tolist() == want["rrf_score"].tolist()
    assert got["bm25_rank"].tolist() == want["bm25_rank"].tolist()
    assert got["cos_rank"].tolist() == want["cos_rank"].tolist()
