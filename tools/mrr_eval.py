"""Offline IR-quality harness: MRR@10 / recall@10 / nDCG@10 / rank-identity
of the engine against a DuckDB qrels oracle on the PG-grounded natural
corpus scaled to 10,500 documents.

The reference's quality evidence is MRR vs qrels with per-rank ground
truth (/root/reference/benchmarks/README.md:115-117,
benchmarks/datasets/msmarco/validate_queries.sql:12-28). Here the graded
qrels are the EXACT oracle's top-100 per query (grade = 101 - oracle
rank), computed by one batched DuckDB pass sharing the engine's scoring
convention (tokenize contract, tf cap, quantized per-doc length, raw
avgdl — pg_textsearch_spark.oracle). The corpus is the 1500-doc live-PG
natural fixture (tests/data/pg_natural_fixture.json.gz) scaled 7x by
deterministic word-prefix truncation (copy j keeps the first
(10-j)/10 of each document's words), so lengths/tf patterns vary and no
two copies are trivial duplicates; the 260 fixture queries are used
verbatim.

Usage: python tools/mrr_eval.py [n_copies] [--queries N]
Prints one JSON line with the metrics; exits nonzero if MRR@10 < 1.0.
"""

from __future__ import annotations

import gzip
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "data",
    "pg_natural_fixture.json.gz")
COPY_STRIDE = 100_000


def load_fixture() -> dict:
    with gzip.open(FIXTURE, "rt") as f:
        return json.load(f)


def scaled_docs(fx: dict, n_copies: int = 7) -> list[tuple[int, str]]:
    """Deterministic scale-up: copy j of doc d has id d.id + j*100000 and
    keeps the first (10-j)/10 of d's words (at least one word)."""
    out = []
    for j in range(n_copies):
        frac = (10 - j) / 10.0
        for d in fx["docs"]:
            words = d["text"].split()
            keep = max(1, int(len(words) * frac))
            out.append((int(d["id"]) + j * COPY_STRIDE,
                        " ".join(words[:keep])))
    return out


def qrels_sql(queries: list[str], k: int = 100, round_to: int = 4) -> str:
    """One batched DuckDB pass: graded qrels (query_id, rank, doc_id,
    score) for every query, over a registered view ``docs(doc_id, text)``.
    Same convention as oracle.bm25_oracle_sql (simple config): regex
    tokenize, per-(doc,term) tf cap 256, quantized per-doc length,
    RAW avgdl, score rounded then ranked (score DESC, doc_id ASC)."""
    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.functions.tokenizer import tokenize_query
    from pg_textsearch_spark.oracle import _fieldnorm_values, _tf_ctes

    opts = Bm25Options(text_config="simple")
    k1, b = float(opts.k1), float(opts.b)
    qvals = []
    for qi, q in enumerate(queries):
        for t, qf in tokenize_query(q, "simple"):
            qvals.append(f"({qi}, '{t}', {float(qf)})")
    if not qvals:
        raise ValueError("no query terms")
    return f"""
WITH {_tf_ctes("docs", "doc_id", "text", "simple")},
dl AS (
  SELECT doc_id, SUM(tf) AS dl,
         (SELECT MAX(v) FROM (VALUES {_fieldnorm_values()}) AS fnorm(v)
          WHERE v <= SUM(tf)) AS qdl
  FROM tf GROUP BY doc_id
),
stats AS (
  SELECT (SELECT count(*) FROM docs) AS n_docs,
         (SELECT COALESCE(SUM(tf), 0) FROM tf) AS total_len
),
qmap(query_id, term, qfreq) AS (VALUES {", ".join(qvals)}),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf
  WHERE term IN (SELECT DISTINCT term FROM qmap) GROUP BY term
),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         q.qfreq
         * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * {k1 + 1.0})
         / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.qdl
              / (s.total_len * 1.0 / s.n_docs))) AS c
  FROM tf JOIN qmap q ON tf.term = q.term
  JOIN dfreq d ON d.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, ROUND(SUM(c), {round_to}) AS score
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, score FROM ranked
WHERE rank <= {k}
ORDER BY query_id, rank
"""


def evaluate(engine_rows, oracle_rows, k: int = 10) -> dict:
    """engine_rows: (query_id, doc_id, score) top-k per query, in rank
    order. oracle_rows: (query_id, rank, doc_id, score) graded qrels.
    MRR@k uses binary relevance = {the oracle's rank-1 doc}; nDCG@k uses
    graded relevance 11 - oracle_rank for oracle rank <= 10."""
    from collections import defaultdict
    eng = defaultdict(list)
    for qid, doc, _sc in engine_rows:
        eng[int(qid)].append(int(doc))
    orc = defaultdict(list)
    for qid, rank, doc, _sc in oracle_rows:
        orc[int(qid)].append((int(rank), int(doc)))
    mrr = rec = ndcg = ident = 0.0
    n = 0
    for qid, ranked in orc.items():
        n += 1
        o_top = [d for r, d in sorted(ranked)[:k]]
        e_top = eng.get(qid, [])[:k]
        top1 = o_top[0]
        mrr += next((1.0 / (i + 1) for i, d in enumerate(e_top)
                     if d == top1), 0.0)
        rec += len(set(e_top) & set(o_top)) / len(o_top)
        grade = {d: 11 - r for r, d in sorted(ranked) if r <= 10}
        dcg = sum(grade.get(d, 0) / math.log2(i + 2)
                  for i, d in enumerate(e_top))
        idcg = sum(g / math.log2(i + 2)
                   for i, g in enumerate(sorted(grade.values(),
                                                reverse=True)[:k]))
        ndcg += (dcg / idcg) if idcg else 1.0
        ident += 1.0 if e_top == o_top else 0.0
    if not n:
        raise ValueError("no query produced oracle results")
    return {"queries": n,
            "mrr_at_10": round(mrr / n, 6),
            "recall_at_10": round(rec / n, 6),
            "ndcg_at_10": round(ndcg / n, 6),
            "rank_identity_rate": round(ident / n, 6)}


def run(spark, n_copies: int = 7, max_queries: int | None = None,
        num_segments: int = 8) -> dict:
    import duckdb
    import pandas as pd

    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.index.build import Bm25Index
    from pg_textsearch_spark.index.query import search_batch

    fx = load_fixture()
    rows = scaled_docs(fx, n_copies)
    queries = fx["queries"][:max_queries] if max_queries else fx["queries"]

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile
    idx_path = tempfile.mkdtemp(prefix="pgts_mrr_idx_")
    os.rmdir(idx_path)
    idx = Bm25Index.build(spark, docs, "text", idx_path, id_col="doc_id",
                          opts=Bm25Options(text_config="simple"),
                          num_segments=num_segments)
    eng = search_batch(idx, queries, k=10).collect()
    engine_rows = [(r["query_id"], r["doc_id"], r["score"]) for r in eng]

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    orc = con.execute(qrels_sql(queries, k=100)).fetchall()

    m = evaluate(engine_rows, orc, k=10)
    m.update({"n_docs": len(rows), "n_copies": n_copies})
    return m


def main() -> int:
    from pg_textsearch_spark.spark_utils import get_spark
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    max_q = None
    if "--queries" in sys.argv:
        max_q = int(sys.argv[sys.argv.index("--queries") + 1])
    spark = get_spark("mrr-eval",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    m = run(spark, n_copies=n_copies, max_queries=max_q)
    print(json.dumps(m))
    return 0 if m["mrr_at_10"] == 1.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
