"""Similarity search over embedding columns.

- ``cosine_topk``  — brute-force cosine top-k per query vector (the exact
  baseline; a broadcast join of the tiny query set against the corpus, one
  window for per-query ranking — at scale the corpus side stays partitioned,
  queries broadcast, ranking is a per-partition local top-k + global merge).
- ``ivf_topk``     — IVF-style bucketed ANN: deterministic "training" picks
  the first ``n_centroids`` vectors as centroids, every corpus vector is
  assigned to its nearest centroid (one broadcast join), queries probe the
  ``nprobe`` nearest centroids and search only those buckets. This is the
  scale path: the probe join touches ~nprobe/n_centroids of the corpus and
  the bucket assignment is a pre-computed partition key.

Dot/norm arithmetic is a strict left-fold over doubles (F.aggregate /
DuckDB list_sum over list_transform), so engine and oracle agree
bit-for-bit; ties broken by vec_id ASC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import DOT_SQL, NORM_SQL, _dot_col, _norm_col


def _with_norm(embs: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return embs.select(F.col(id_col).alias("vec_id"), v.alias("v"),
                       _norm_col(v).alias("nrm"))


def cosine_topk(embs: DataFrame, query_ids: list[int], k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors (excluding the query set itself) for each
    query vector drawn from the same table by id."""
    base = _with_norm(embs, vec_col, id_col)
    queries = base.filter(F.col("vec_id").isin(query_ids)) \
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    corpus = base.filter(~F.col("vec_id").isin(query_ids))
    cos = _dot_col(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = corpus.crossJoin(F.broadcast(queries)) \
                   .select("query_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("query_id", "rank"))


def cosine_topk_oracle_sql(query_ids: list[int], k: int = 5, dim: int = 64,
                           table: str = "embeddings",
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    dot = DOT_SQL.format(dim=dim, a="q.v", b="c.v")
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
         {NORM_SQL.format(a=f"{vec_col}::DOUBLE[]")} AS nrm
  FROM {table}
),
q AS (SELECT vec_id AS query_id, v, nrm FROM base WHERE vec_id IN ({ids})),
c AS (SELECT * FROM base WHERE vec_id NOT IN ({ids})),
scored AS (
  SELECT q.query_id, c.vec_id,
         {dot} / (q.nrm * c.nrm) AS cos
  FROM q, c
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank::BIGINT AS rank, vec_id, ROUND(cos, 4) AS cos
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""


def ivf_topk(embs: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = 16, nprobe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-bucketed ANN. Deterministic centroids (lowest ``n_centroids``
    vec_ids) stand in for k-means training; assignment and probing are
    cosine-nearest with vec_id/centroid-id tie-breaks. Results are
    approximate vs ``cosine_topk`` exactly when a true neighbor lives in an
    unprobed bucket — the classic IVF recall trade-off."""
    base = _with_norm(embs, vec_col, id_col)
    cents = (base.orderBy("vec_id").limit(n_centroids)
             .select(F.col("vec_id").alias("cent_id"),
                     F.col("v").alias("cv"), F.col("nrm").alias("cn")))
    ccos = _dot_col(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    wassign = Window.partitionBy("vec_id").orderBy(
        F.desc("ccos"), F.asc("cent_id"))
    assigned = (base.crossJoin(F.broadcast(cents))
                .select("vec_id", "v", "nrm", "cent_id", ccos.alias("ccos"))
                .withColumn("rn", F.row_number().over(wassign))
                .filter("rn = 1")
                .select("vec_id", "v", "nrm", "cent_id"))

    queries = base.filter(F.col("vec_id").isin(query_ids)) \
                  .select(F.col("vec_id").alias("query_id"),
                          F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    qcos = _dot_col(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    wprobe = Window.partitionBy("query_id").orderBy(
        F.desc("qcos"), F.asc("cent_id"))
    probes = (queries.crossJoin(F.broadcast(cents))
              .select("query_id", "qv", "qn", "cent_id", qcos.alias("qcos"))
              .withColumn("rn", F.row_number().over(wprobe))
              .filter(F.col("rn") <= nprobe)
              .select("query_id", "qv", "qn", "cent_id"))

    cand = probes.join(assigned, "cent_id") \
                 .filter(~F.col("vec_id").isin(query_ids))
    cos = _dot_col(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (cand.select("query_id", "vec_id", cos.alias("cos"))
            .distinct()
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("rank").cast("long").alias("rank"),
                    "vec_id", F.round("cos", 4).alias("cos"))
            .orderBy("query_id", "rank"))


def ivf_topk_oracle_sql(query_ids: list[int], k: int = 5,
                        n_centroids: int = 16, nprobe: int = 2, dim: int = 64,
                        table: str = "embeddings",
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
         {NORM_SQL.format(a=f"{vec_col}::DOUBLE[]")} AS nrm
  FROM {table}
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM base
  ORDER BY vec_id LIMIT {n_centroids}
),
assigned AS (
  SELECT vec_id, v, nrm, cent_id FROM (
    SELECT b.vec_id, b.v, b.nrm, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY b.vec_id
             ORDER BY {DOT_SQL.format(dim=dim, a='b.v', b='c.cv')} / (b.nrm * c.cn) DESC,
                      c.cent_id ASC) AS rn
    FROM base b, cents c)
  WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM base
      WHERE vec_id IN ({ids})),
probes AS (
  SELECT query_id, qv, qn, cent_id FROM (
    SELECT q.query_id, q.qv, q.qn, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY {DOT_SQL.format(dim=dim, a='q.qv', b='c.cv')} / (q.qn * c.cn) DESC,
                      c.cent_id ASC) AS rn
    FROM q, cents c)
  WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id,
         {DOT_SQL.format(dim=dim, a='p.qv', b='a.v')} / (p.qn * a.nrm) AS cos
  FROM probes p JOIN assigned a ON a.cent_id = p.cent_id
  WHERE a.vec_id NOT IN ({ids})
),
ranked AS (
  SELECT query_id, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS rank
  FROM cand
)
SELECT query_id, rank::BIGINT AS rank, vec_id, ROUND(cos, 4) AS cos
FROM ranked WHERE rank <= {k}
ORDER BY query_id, rank
"""
