"""ANSI-SQL (DuckDB-runnable) oracle generators for the BM25 engine.

The reference validates its engine against an executable SQL oracle that
shares the tokenizer with the engine (reference: test/sql/validation.sql:1-212
tokenizes with the same ``to_tsvector`` the index uses). We do the same: the
engine's ``simple`` text config is deliberately SQL-expressible
(``regexp_extract_all(lower(text), '[a-z0-9_]+')``), so these generators emit
a self-contained SQL statement computing the exact BM25 contract of
SURVEY.md §1.4 — per-chunk tf cap, fieldnorm-quantized dl, raw-avgdl, the
idf/tf formula, (score DESC, doc_id ASC) ordering — for OR / AND / phrase
modes. The driver runs them in DuckDB against the same parquet and compares
row counts, schemas and value hashes with the Spark engine's output.

The ``english`` config (Snowball stemmer + stopwords) is ALSO
SQL-expressible: ``functions.stemmer_sql`` emits a chained-CTE Porter2
implementation validated token-for-token against the engine's Python
stemmer, and the stopword list inlines as a ``NOT IN`` — so english-config
searches are hash-checkable by the driver too.
"""

from __future__ import annotations

from .config import Bm25Options
from .functions.fieldnorm import DECODE_TABLE
from .functions.stemmer_sql import stem_cte_sql
from .functions.tokenizer import (ENGLISH_STOPWORDS, config_parts,
                                  tokenize_query)

TOKEN_SQL_PATTERN = "[a-z0-9_]+"
# fr/de/es word characters include the accented Latin-1 letters
# (tokenizer.TOKEN_PATTERN_LATIN1)
TOKEN_SQL_PATTERN_LATIN1 = "[a-z0-9_ß-ÿ]+"

_INTL_CONFIGS = ("french", "german", "spanish")


def _sq(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def stem_values_sql(config: str, vocab: list[str]) -> str:
    """``(VALUES ...)`` rows mapping each non-stopword token of ``vocab``
    to its lexeme under ``config``'s Snowball stemmer.

    This SHARES the engine's (PG-``ts_lexize``-validated,
    tests/test_stemmer_intl.py) stemmer with the SQL oracle — the same
    trust model the reference uses when its SQL oracle calls the engine's
    own ``to_tsvector`` (reference test/sql/validation.sql:1-12). The
    mapping is exhaustive over the supplied vocabulary; the consuming CTE
    LEFT JOINs and marks unmapped tokens loudly so a vocabulary gap
    surfaces as a hash mismatch, never a silent pass."""
    pattern, stopwords, stem_fn = config_parts(config)
    if stem_fn is None:
        raise ValueError(f"config {config!r} has no stemmer")
    seen: dict[str, str] = {}
    for word in vocab:
        for tok in pattern.findall(word.lower()):
            if tok in seen or len(tok) > 2047:
                continue
            if stopwords and tok in stopwords:
                continue
            seen[tok] = stem_fn(tok)
    if not seen:
        raise ValueError("empty stem vocabulary")
    return ", ".join(f"({_sq(t)}, {_sq(lx)})" for t, lx in sorted(seen.items()))


def _tf_ctes(table: str, id_col: str, text_col: str, config: str,
             stem_vocab: list[str] | None = None) -> str:
    """CTE block ending in ``tf(doc_id, term, tf)`` for the given config.

    ``simple``: tokens are lexemes; tf caps at 256 per (doc, token).
    ``english``: the per-WORD tf cap applies before stemming merges words
    into one lexeme (engine ``_chunk_term_freqs`` order: cap, then merge),
    stopwords drop before counting, and stemming runs once per DISTINCT
    token through the Porter2 CTE chain.
    ``french``/``german``/``spanish``: same shape, but the stems relation
    is an inline VALUES mapping generated from the engine's PG-validated
    Snowball stemmer over ``stem_vocab`` (see :func:`stem_values_sql`)."""
    pat = (TOKEN_SQL_PATTERN_LATIN1 if config in _INTL_CONFIGS
           else TOKEN_SQL_PATTERN)
    tok = f"""tok AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '{pat}')) AS term
  FROM {table}
)"""
    if config == "simple":
        return tok + """,
tf AS (
  SELECT doc_id, term, LEAST(count(*), 256) AS tf
  FROM tok GROUP BY doc_id, term
)"""
    _, stopwords, _ = config_parts(config)
    stop = ", ".join(_sq(s) for s in sorted(stopwords))
    if config in _INTL_CONFIGS:
        if not stem_vocab:
            raise ValueError(
                f"config {config!r} oracle needs stem_vocab (the corpus "
                "vocabulary to inline as the stems mapping)")
        stems = (f"stems(term, lexeme) AS "
                 f"(VALUES {stem_values_sql(config, stem_vocab)})")
        tf = """tf AS (
  SELECT w.doc_id,
         COALESCE(s.lexeme, w.term || '<!unmapped>') AS term,
         SUM(w.wtf)::BIGINT AS tf
  FROM wtf w LEFT JOIN stems s ON s.term = w.term
  GROUP BY 1, 2
)"""
    else:
        stems = ("toks AS (SELECT DISTINCT term FROM wtf),\n"
                 + stem_cte_sql("toks", "term"))
        tf = """tf AS (
  SELECT w.doc_id, s.lexeme AS term, SUM(w.wtf)::BIGINT AS tf
  FROM wtf w JOIN stems s ON s.term = w.term
  GROUP BY 1, 2
)"""
    return tok + f""",
wtf AS (
  SELECT doc_id, term, LEAST(count(*), 256) AS wtf
  FROM tok
  WHERE term NOT IN ({stop}) AND length(term) <= 2047
  GROUP BY doc_id, term
),
{stems},
{tf}"""


def _fieldnorm_values(max_len: int = 100_000) -> str:
    vals = [int(v) for v in DECODE_TABLE if v <= max_len]
    return ", ".join(f"({v})" for v in vals)


def _qterm_values(qterms: list[tuple[str, int]]) -> str:
    return ", ".join(f"('{t}', {float(qf)})" for t, qf in qterms)


def bm25_oracle_sql(
    query: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int | None = 10,
    mode: str = "or",
    opts: Bm25Options | None = None,
    round_to: int = 4,
    stem_vocab: list[str] | None = None,
) -> str:
    """SQL computing BM25 top-k for ``query`` under the given text config.

    Output columns: (doc_id BIGINT, score DOUBLE) ordered by
    (score DESC, doc_id ASC) — identical names/semantics to the engine's
    ``search``/``score_exhaustive`` output. fr/de/es configs additionally
    need ``stem_vocab`` (see :func:`stem_values_sql`).
    """
    opts = opts or Bm25Options(text_config="simple")
    if opts.text_config not in ("simple", "english") + _INTL_CONFIGS:
        raise ValueError("SQL oracle supports the 'simple', 'english', "
                         "'french', 'german' and 'spanish' text configs")
    if mode == "phrase" and opts.text_config != "simple":
        raise ValueError("phrase oracle requires the 'simple' config")
    qterms = tokenize_query(query, opts.text_config)
    if not qterms:
        return f"SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS score WHERE FALSE"
    k1, b = float(opts.k1), float(opts.b)

    phrase_cte, phrase_join = "", ""
    if mode == "phrase":
        phrase_cte, phrase_join = _phrase_clauses(query, table, id_col, text_col)

    and_having = ""
    if mode == "and":
        n_distinct = len({t for t, _ in qterms})
        and_having = f"HAVING count(DISTINCT c.term) = {n_distinct}"

    sql = f"""
WITH {_tf_ctes(table, id_col, text_col, opts.text_config, stem_vocab)},
dl AS (
  SELECT doc_id, SUM(tf) AS dl,
         (SELECT MAX(v) FROM (VALUES {_fieldnorm_values()}) AS fnorm(v)
          WHERE v <= SUM(tf)) AS qdl
  FROM tf GROUP BY doc_id
),
stats AS (
  SELECT (SELECT count(*) FROM {table}) AS n_docs,
         (SELECT COALESCE(SUM(tf), 0) FROM tf) AS total_len
),
qterms(term, qfreq) AS (VALUES {_qterm_values(qterms)}),
dfreq AS (
  SELECT q.term, (SELECT count(DISTINCT tf.doc_id) FROM tf WHERE tf.term = q.term) AS df
  FROM qterms q
),{phrase_cte}
contrib AS (
  SELECT tf.doc_id, tf.term,
         q.qfreq
         * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * {k1 + 1.0})
         / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.qdl
              / (s.total_len * 1.0 / s.n_docs))) AS c
  FROM tf
  JOIN qterms q ON tf.term = q.term
  JOIN dfreq d ON d.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT c.doc_id, ROUND(SUM(c.c), {round_to}) AS score
FROM contrib c{phrase_join}
GROUP BY c.doc_id
{and_having}
ORDER BY score DESC, c.doc_id ASC
"""
    if k is not None:
        sql += f"LIMIT {k}\n"
    return sql


def _phrase_clauses(query: str, table: str, id_col: str,
                    text_col: str) -> tuple[str, str]:
    """CTE + semi-join restricting scoring to docs containing the query's
    token sequence at consecutive positions (engine ``mode='phrase'``;
    simple config keeps every token, so positions enumerate all tokens)."""
    import re
    from .functions.tokenizer import TOKEN_PATTERN
    words = TOKEN_PATTERN.findall(query.lower())
    if not words:
        raise ValueError("empty phrase")
    joins, conds = [], [f"p0.term = '{words[0]}'"]
    for i, w in enumerate(words[1:], start=1):
        joins.append(
            f"JOIN tokpos p{i} ON p{i}.doc_id = p0.doc_id "
            f"AND p{i}.pos = p0.pos + {i} AND p{i}.term = '{w}'")
    cte = f"""
tokpos AS (
  SELECT doc_id, unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM (SELECT {id_col} AS doc_id,
               regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}') AS toks
        FROM {table})
),
phrase_docs AS (
  SELECT DISTINCT p0.doc_id
  FROM tokpos p0
  {' '.join(joins)}
  WHERE {conds[0]}
),"""
    join = "\nJOIN phrase_docs pd ON pd.doc_id = c.doc_id"
    return cte, join


def term_stats_oracle_sql(
    terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle for ``Bm25Index.term_stats``: (term, doc_freq, idf)."""
    values = ", ".join(f"('{t}')" for t in terms)
    return f"""
WITH tok AS (
  SELECT {id_col} AS doc_id,
         unnest(regexp_extract_all(lower({text_col}), '{TOKEN_SQL_PATTERN}')) AS term
  FROM {table}
),
n AS (SELECT count(*) AS n_docs FROM {table}),
qt(term) AS (VALUES {values})
SELECT qt.term,
       count(DISTINCT tok.doc_id) AS doc_freq,
       ROUND(ln(1.0 + ((SELECT n_docs FROM n) - count(DISTINCT tok.doc_id) + 0.5)
                / (count(DISTINCT tok.doc_id) + 0.5)), 6) AS idf
FROM qt JOIN tok ON tok.term = qt.term
GROUP BY qt.term
ORDER BY qt.term
"""


def bm25_batch_oracle_sql(queries: list[str], k: int = 10,
                          table: str = "documents", id_col: str = "doc_id",
                          text_col: str = "text",
                          opts: Bm25Options | None = None) -> str:
    """Oracle for ``search_batch``: UNION ALL of the per-query oracles with
    a ``query_id`` column, ordered by (query_id, score DESC, doc_id ASC)."""
    parts = []
    for i, q in enumerate(queries):
        inner = bm25_oracle_sql(q, table=table, id_col=id_col,
                                text_col=text_col, k=k, opts=opts)
        parts.append(f"SELECT {i} AS query_id, * FROM (\n{inner}\n)")
    return ("\nUNION ALL\n".join(parts)
            + "\nORDER BY query_id, score DESC, doc_id")


def facet_oracle_sql(query: str, k: int = 50, facet_col: str = "lang",
                     table: str = "documents", id_col: str = "doc_id",
                     text_col: str = "text",
                     opts: Bm25Options | None = None) -> str:
    """Oracle for top-k faceting (reference README.md:509-529: facet counts
    over the top-k result set): bm25 top-k joined back to the source,
    grouped by the facet column."""
    inner = bm25_oracle_sql(query, table=table, id_col=id_col,
                            text_col=text_col, k=k, opts=opts)
    return f"""
WITH topk AS (
{inner}
)
SELECT d.{facet_col} AS facet, COUNT(*)::BIGINT AS n_docs,
       ROUND(MAX(t.score), 4) AS best_score
FROM topk t JOIN {table} d ON t.doc_id = d.{id_col}
GROUP BY d.{facet_col}
ORDER BY n_docs DESC, facet
"""
