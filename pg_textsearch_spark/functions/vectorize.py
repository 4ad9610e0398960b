"""to_bm25vector analogue — expose the tokenized representation as data.

The reference's ``bm25vector`` type (src/types/vector.c, sql/
pg_textsearch--1.4.0-dev.sql:34-66) is the materialized
(lexeme, frequency) form of a document under a text config; users cast
text to it to inspect/store tokenization output. The Spark-native
equivalent is a DataFrame: one row per (doc_id, lexeme, tf) — the
exploded vector — produced by the same Arrow tokenizer pass the index
build uses, so what you see is exactly what gets indexed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import Bm25Options
from ..spark_utils import doc_postings


def to_bm25vector(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  config: str = "simple") -> DataFrame:
    """(doc_id, lexeme, tf) rows for every document, empty docs omitted,
    ordered (doc_id, lexeme) — bm25vector_out's sorted textual form."""
    opts = Bm25Options(text_config=config)
    return (doc_postings(docs, text_col, id_col, opts)
            .filter(F.col("term").isNotNull())
            .select("doc_id", F.col("term").alias("lexeme"),
                    F.col("tf").cast("long").alias("tf"))
            .orderBy("doc_id", "lexeme"))


def to_bm25vector_oracle_sql(table: str = "documents",
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             config: str = "simple") -> str:
    from ..oracle import _tf_ctes
    return f"""
WITH {_tf_ctes(table, id_col, text_col, config)}
SELECT doc_id, term AS lexeme, tf::BIGINT AS tf
FROM tf ORDER BY doc_id, lexeme
"""
