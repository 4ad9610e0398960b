"""Benchmark decontamination: flag training documents that share any word
n-gram with an evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C, PaLM, Llama all
use word-n-gram overlap, typically n = 8-13 for prose): a training doc is
contaminated when any of its n-grams appears in any eval example —
train/test leakage that inflates benchmark scores. Distinct from
in-corpus dedup (operators/dedup.py): the comparison set is external,
tiny and fixed.

100 TB shape: the eval side is small by construction (10^3-10^6 examples
-> at most a few 10^7 distinct n-grams), so it is BROADCAST; the corpus
side is a pure map (tokenize -> n-gram -> explode) into a broadcast hash
join — the full corpus never shuffles. The only exchange is the final
groupBy over the join HITS, which are rare by definition (if most of the
corpus is contaminated you have a bigger problem). Grams are joined as
strings for exactness; at extreme scale swap the join key to
``hash32_col(gram)`` on both sides — a collision only ever drops an
extra doc, which is the conservative direction for decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import WORD_RE


def _ngram_col(w: F.Column, n: int) -> F.Column:
    """Distinct word n-grams of array column ``w`` joined by single spaces
    (the zip_with-over-shifted-slices shape — each input array evaluates
    once per row; see dedup._shingle_frame for the transform(sequence)
    anti-pattern it avoids)."""
    z = w
    for j in range(1, n):
        wj = F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        z = F.zip_with(z, wj, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.array_distinct(
        F.slice(z, 1, F.greatest(F.size(w) - (n - 1), F.lit(0))))


def _gram_rows(df: DataFrame, n: int, text_col: str, id_col: str,
               out_id: str) -> DataFrame:
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    base = df.select(F.col(id_col).alias(out_id), words.alias("words"))
    return (base.filter(F.size("words") >= n)
            .select(out_id, F.explode(_ngram_col(F.col("words"), n))
                    .alias("gram")))


def decontaminate(docs: DataFrame, eval_df: DataFrame, n: int = 13,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str = "text",
                  eval_id_col: str = "eval_id") -> DataFrame:
    """Contaminated docs only: (doc_id, hit_ngrams, eval_hits) where
    ``hit_ngrams`` = distinct doc n-grams found anywhere in the eval set
    and ``eval_hits`` = distinct eval examples sharing at least one
    n-gram. Docs with zero overlap are absent (anti-join against this
    result to keep the clean corpus)."""
    dg = _gram_rows(docs, n, text_col, id_col, "doc_id")
    eg = _gram_rows(eval_df, n, eval_text_col, eval_id_col, "eval_id")
    hits = dg.join(F.broadcast(eg), "gram")
    return (hits.groupBy("doc_id")
            .agg(F.countDistinct("gram").alias("hit_ngrams"),
                 F.countDistinct("eval_id").alias("eval_hits"))
            .orderBy("doc_id"))


def decontaminate_oracle_sql(eval_sql: str, n: int = 13,
                             table: str = "documents",
                             text_col: str = "text",
                             id_col: str = "doc_id") -> str:
    """DuckDB twin. ``eval_sql``: subquery producing (eval_id, text)."""
    gram = f"array_to_string(w[i:i+{n - 1}], ' ')"
    rng = f"range(1, GREATEST(len(w) - {n - 2}, 1))"
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{WORD_RE}') AS w
  FROM {table}
),
ebase AS (
  SELECT eval_id, regexp_extract_all(lower(text), '{WORD_RE}') AS w
  FROM ({eval_sql})
),
dg AS (
  SELECT DISTINCT doc_id, unnest([{gram} for i in {rng}]) AS gram
  FROM base WHERE len(w) >= {n}
),
eg AS (
  SELECT DISTINCT eval_id, unnest([{gram} for i in {rng}]) AS gram
  FROM ebase WHERE len(w) >= {n}
)
SELECT doc_id,
       COUNT(DISTINCT gram)::BIGINT AS hit_ngrams,
       COUNT(DISTINCT eval_id)::BIGINT AS eval_hits
FROM dg JOIN eg USING (gram)
GROUP BY doc_id
ORDER BY doc_id
"""
