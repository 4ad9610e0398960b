"""Hybrid lexical + vector retrieval with Reciprocal Rank Fusion.

The standard two-tower retrieval shape (Cormack, Clarke & Buettcher,
SIGIR 2009): run a BM25 text query and a cosine vector query
independently, keep each side's top ``n_candidates`` ranked list, and
fuse by summing ``1 / (rrf_k + rank)`` per document — no score
calibration between the two spaces is needed, which is exactly why RRF
is the production default for BM25 x embedding hybrid search.

Reference anchor: the reference engine is the BM25 half of this pattern
(README.md:1-40 positions it next to pgvector for hybrid search); the
fusion itself is public-literature standard.

100 TB shape: fusion cost is O(n_candidates) — two tiny ranked lists,
one broadcastable full-outer join. The heavy lifting stays in the two
retrieval operators, each of which already has a scale path
(:class:`~pg_textsearch_spark.index.build.Bm25Index` segment search with
block-max pruning; :class:`~pg_textsearch_spark.operators.similarity`
IVF buckets). :func:`rrf_fuse` is the composition point: feed it ANY two
(id, rank) DataFrames — e.g. ``Bm25Index.search`` + ``IvfIndex.search``
— while :func:`hybrid_rrf` wires the exhaustive/brute-force pair whose
DuckDB twin the driver hash-checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import Bm25Options
from ..oracle import bm25_oracle_sql
from .exhaustive import score_exhaustive
from .similarity import DOT_SQL, NORM_SQL, _dot_col, _with_norm

__all__ = ["rrf_fuse", "hybrid_rrf", "hybrid_rrf_oracle_sql",
           "hybrid_scale_rrf", "hybrid_scale_rrf_oracle_sql",
           "hybrid_serve"]


def hybrid_serve(bm25_local, ann_local, query: str, query_vec,
                 k: int = 10, rrf_k: int = 60, n_candidates: int = 50,
                 nprobe: int | None = None, exclude_ids=()):
    """Driver-local hybrid retrieval — the SERVING twin of
    :func:`hybrid_scale_rrf`: ``LocalSearcher.search`` (BM25) +
    ``LocalAnnSearcher.search_vector`` (IVF probe), RRF-fused in plain
    Python. No Spark job — millisecond hybrid point queries from the
    same shared artifacts (pinned result-identical to the Spark
    composition in tests/test_hybrid.py). ``exclude_ids``: vector-side
    exclusions (pass the seed id to mirror ``search_ids`` semantics).
    Returns a pandas frame (doc_id, rrf_score, bm25_rank, cos_rank)
    ordered (rrf_score DESC, doc_id ASC)."""
    import pandas as pd
    bm = bm25_local.search(query, k=n_candidates)
    ranks: dict[int, list[int]] = {}
    for i, doc in enumerate(bm["doc_id"].tolist()):
        ranks[int(doc)] = [i + 1, 0]
    if nprobe is None:
        nprobe = int(ann_local.cent_ids.size)
    cs = ann_local.search_vector(query_vec, k=n_candidates, nprobe=nprobe,
                                 exclude_ids=tuple(exclude_ids))
    for r, vid in zip(cs["rank"].tolist(), cs["vec_id"].tolist()):
        ranks.setdefault(int(vid), [0, 0])[1] = int(r)
    rows = []
    for doc, (ra, rb) in ranks.items():
        s = ((1.0 / (rrf_k + ra) if ra else 0.0)
             + (1.0 / (rrf_k + rb) if rb else 0.0))
        rows.append((doc, round(s, 6), ra, rb))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return pd.DataFrame(rows[:k], columns=["doc_id", "rrf_score",
                                           "bm25_rank", "cos_rank"])


def rrf_fuse(ranked_a: DataFrame, ranked_b: DataFrame, k: int = 10,
             rrf_k: int = 60, id_col: str = "doc_id",
             rank_cols: tuple[str, str] = ("bm25_rank", "cos_rank"),
             round_to: int = 6) -> DataFrame:
    """Fuse two (id, rank) lists: ``score = sum 1/(rrf_k + rank)`` over
    the lists containing the doc. Missing ranks contribute 0 and surface
    as rank 0 in the output (never null, for stable hashing). Output:
    (doc_id, rrf_score, <rank_cols>) ordered by (rrf_score DESC, doc_id
    ASC), top ``k``."""
    a_name, b_name = rank_cols
    a = ranked_a.select(F.col(id_col).alias("doc_id"),
                        F.col(a_name).cast("long").alias("ra"))
    b = ranked_b.select(F.col(id_col).alias("doc_id"),
                        F.col(b_name).cast("long").alias("rb"))
    part = lambda c: F.when(c.isNotNull(),
                            F.lit(1.0) / (F.lit(float(rrf_k)) + c)) \
                      .otherwise(F.lit(0.0))
    fused = (a.join(b, "doc_id", "full_outer")
             .select("doc_id",
                     F.round(part(F.col("ra")) + part(F.col("rb")),
                             round_to).alias("rrf_score"),
                     F.coalesce(F.col("ra"), F.lit(0)).alias(a_name),
                     F.coalesce(F.col("rb"), F.lit(0)).alias(b_name)))
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)


def hybrid_rrf(spark: SparkSession, docs: DataFrame, embs: DataFrame,
               query: str, query_vec_id: int, k: int = 10,
               rrf_k: int = 60, n_candidates: int = 50,
               opts: Bm25Options | None = None,
               text_col: str = "text", id_col: str = "doc_id",
               vec_col: str = "embedding",
               vec_id_col: str = "vec_id") -> DataFrame:
    """BM25(``query``) + cosine(vector of ``query_vec_id``) over aligned
    id spaces (``doc_id`` == ``vec_id``), RRF-fused. The query document
    itself stays in both candidate sets (a seed-document search ranks the
    seed first on the vector side — callers filter it if unwanted)."""
    opts = opts or Bm25Options()
    bm = score_exhaustive(spark, docs, text_col, id_col, query,
                          opts=opts, k=n_candidates)
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_ranked = bm.select("doc_id", "score") \
                  .withColumn("bm25_rank", F.row_number().over(wb))

    base = _with_norm(embs, vec_col, vec_id_col)
    q = base.filter(F.col("vec_id") == query_vec_id) \
            .select(F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    cos = _dot_col(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    # top-n_candidates FIRST via orderBy+limit (TakeOrderedAndProject:
    # per-partition bounded heaps, no exchange of the full corpus), THEN
    # rank the <=n_candidates survivors. The previous unpartitioned
    # row_number() window forced a single-partition sort of EVERY corpus
    # vector before the rank filter — a scale-killer at 25 B embeddings.
    wc = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    cs_ranked = (base.crossJoin(F.broadcast(q))
                 .select(F.col("vec_id").alias("doc_id"), cos.alias("cos"))
                 .orderBy(F.desc("cos"), F.asc("doc_id"))
                 .limit(n_candidates)
                 .withColumn("cos_rank", F.row_number().over(wc)))

    return rrf_fuse(bm_ranked, cs_ranked, k=k, rrf_k=rrf_k)


def hybrid_scale_rrf(bm25_index, ivf_index, query: str, query_vec_id: int,
                     k: int = 10, rrf_k: int = 60, n_candidates: int = 50,
                     nprobe: int | None = None) -> DataFrame:
    """The PRODUCTION hybrid composition: BM25 segment-index search
    (block-max pruned, ``Bm25Index.search``) + IVF ANN probe
    (``IvfIndex.search_ids`` — cent_id partition pruning), RRF-fused.

    This is the scale path :func:`hybrid_rrf` is the exhaustive oracle
    twin of: both retrieval legs read persisted index artifacts and touch
    only the postings / buckets the query needs, so the fusion's cost is
    independent of corpus size. ``nprobe`` defaults to every centroid
    (exact recall — the oracle-checkable setting); production callers dial
    it down for the usual IVF recall/latency trade.

    The seed document stays in the BM25 candidate list but is excluded
    from the vector list (``search_ids`` never returns its own query ids
    — FAISS convention), mirroring ``hybrid_scale_rrf_oracle_sql``.

    Reference anchor: /root/reference/README.md:1-40 positions
    pg_textsearch beside pgvector for exactly this BM25 x vector split.
    """
    bm = bm25_index.search(query, k=n_candidates)
    wb = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm_ranked = bm.select("doc_id", "score") \
                  .withColumn("bm25_rank", F.row_number().over(wb))
    if nprobe is None:
        nprobe = int(ivf_index.meta["n_centroids"])
    cs_ranked = (ivf_index.search_ids([int(query_vec_id)], k=n_candidates,
                                      nprobe=nprobe)
                 .select(F.col("vec_id").alias("doc_id"),
                         F.col("rank").alias("cos_rank")))
    return rrf_fuse(bm_ranked, cs_ranked, k=k, rrf_k=rrf_k)


def hybrid_scale_rrf_oracle_sql(query: str, query_vec_id: int, k: int = 10,
                                rrf_k: int = 60, n_candidates: int = 50,
                                dim: int = 64,
                                opts: Bm25Options | None = None,
                                doc_table: str = "documents",
                                emb_table: str = "embeddings",
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                vec_col: str = "embedding",
                                vec_id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`hybrid_scale_rrf` at ``nprobe=n_centroids``:
    with every bucket probed the IVF leg IS exact cosine over the corpus
    minus the seed vector, so the oracle needs no centroid emulation."""
    inner_bm = bm25_oracle_sql(query, table=doc_table, id_col=id_col,
                               text_col=text_col, k=n_candidates, opts=opts)
    dot = DOT_SQL.format(dim=dim, a="q.v", b="c.v")
    return f"""
WITH bm_scores AS (
{inner_bm}
),
bm AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
  FROM bm_scores
),
embase AS (
  SELECT {vec_id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
         {NORM_SQL.format(a=f"{vec_col}::DOUBLE[]")} AS nrm
  FROM {emb_table}
),
q AS (SELECT v, nrm FROM embase WHERE vec_id = {query_vec_id}),
cs AS (
  SELECT doc_id, cos_rank FROM (
    SELECT c.vec_id AS doc_id,
           ROW_NUMBER() OVER (
             ORDER BY {dot} / (q.nrm * c.nrm) DESC, c.vec_id ASC
           ) AS cos_rank
    FROM embase c, q
    WHERE c.vec_id <> {query_vec_id}
  ) WHERE cos_rank <= {n_candidates}
)
SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
       ROUND(COALESCE(1.0 / ({rrf_k} + bm.bm25_rank), 0)
             + COALESCE(1.0 / ({rrf_k} + cs.cos_rank), 0), 6) AS rrf_score,
       COALESCE(bm.bm25_rank, 0)::BIGINT AS bm25_rank,
       COALESCE(cs.cos_rank, 0)::BIGINT AS cos_rank
FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""


def hybrid_rrf_oracle_sql(query: str, query_vec_id: int, k: int = 10,
                          rrf_k: int = 60, n_candidates: int = 50,
                          dim: int = 64,
                          opts: Bm25Options | None = None,
                          doc_table: str = "documents",
                          emb_table: str = "embeddings",
                          text_col: str = "text", id_col: str = "doc_id",
                          vec_col: str = "embedding",
                          vec_id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`hybrid_rrf` (same rank + fusion semantics)."""
    inner_bm = bm25_oracle_sql(query, table=doc_table, id_col=id_col,
                               text_col=text_col, k=n_candidates, opts=opts)
    dot = DOT_SQL.format(dim=dim, a="q.v", b="c.v")
    return f"""
WITH bm_scores AS (
{inner_bm}
),
bm AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS bm25_rank
  FROM bm_scores
),
embase AS (
  SELECT {vec_id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
         {NORM_SQL.format(a=f"{vec_col}::DOUBLE[]")} AS nrm
  FROM {emb_table}
),
q AS (SELECT v, nrm FROM embase WHERE vec_id = {query_vec_id}),
cs AS (
  SELECT doc_id, cos_rank FROM (
    SELECT c.vec_id AS doc_id,
           ROW_NUMBER() OVER (
             ORDER BY {dot} / (q.nrm * c.nrm) DESC, c.vec_id ASC
           ) AS cos_rank
    FROM embase c, q
  ) WHERE cos_rank <= {n_candidates}
)
SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
       ROUND(COALESCE(1.0 / ({rrf_k} + bm.bm25_rank), 0)
             + COALESCE(1.0 / ({rrf_k} + cs.cos_rank), 0), 6) AS rrf_score,
       COALESCE(bm.bm25_rank, 0)::BIGINT AS bm25_rank,
       COALESCE(cs.cos_rank, 0)::BIGINT AS cos_rank
FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""
