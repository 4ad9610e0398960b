"""IR-quality gate: MRR@10 / recall@10 / nDCG@10 / rank identity of the
engine vs the DuckDB qrels oracle on the PG-grounded natural corpus
scaled to 10,500 docs (tools/mrr_eval.py — the reference's MRR-vs-qrels
quality criterion, benchmarks/README.md:115-117). The full 260-query run
lives in the tool / VALIDATION.md; the gate subsamples every 5th query
to bound test time."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_mrr_at_10_is_exact_vs_oracle(spark):
    import mrr_eval

    fx = mrr_eval.load_fixture()
    rows = mrr_eval.scaled_docs(fx, n_copies=7)
    assert len(rows) == 10_500
    queries = fx["queries"][::5]

    import duckdb
    import pandas as pd

    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.index.build import Bm25Index
    from pg_textsearch_spark.index.query import search_batch

    import tempfile
    path = tempfile.mkdtemp(prefix="pgts_mrr_gate_")
    os.rmdir(path)
    idx = Bm25Index.build(spark, spark.createDataFrame(
        rows, "doc_id long, text string"), "text", path,
        id_col="doc_id", opts=Bm25Options(text_config="simple"),
        num_segments=8)
    eng = [(r["query_id"], r["doc_id"], r["score"])
           for r in search_batch(idx, queries, k=10).collect()]

    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    orc = con.execute(mrr_eval.qrels_sql(queries, k=100)).fetchall()

    m = mrr_eval.evaluate(eng, orc, k=10)
    assert m["queries"] >= 45
    assert m["mrr_at_10"] == 1.0, m
    assert m["recall_at_10"] == 1.0, m
    assert m["ndcg_at_10"] == 1.0, m
    assert m["rank_identity_rate"] == 1.0, m
