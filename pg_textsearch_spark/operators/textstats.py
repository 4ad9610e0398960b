"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are JVM-side built-in expressions (regexp_extract_all,
higher-order array functions, window functions) — no Python UDFs — so at
100 TB they run inside whole-stage codegen with filters/projections pushed
to the parquet scan. Each operator ships a matching DuckDB oracle-SQL
generator used by the driver's correctness gate.

Operators:
- ``token_counts``      — whitespace / word-regex / BPE-ish-regex token counts
- ``quality_scores``    — length, punctuation-ratio, stopword-ratio quality score
- ``lang_id``           — marker-word + script n-gram language heuristic
- ``fingerprints``      — winnowing document fingerprints (rolling k-gram
                          hashes, window-min selection; Schleimer et al. 2003)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import ENGLISH_STOPWORDS

WORD_RE = "[a-z0-9_]+"
WS_RE = "[^ \\t\\n\\r]+"
# BPE-ish pre-tokenizer: letter runs, single digits, single non-alnum marks
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 \\t\\n\\r]"

#: deterministic 32-bit hash computable identically in Spark and DuckDB:
#: first 8 hex chars of md5, parsed as an unsigned int.
def hash32_col(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    return f"(('0x' || substring(md5({expr}), 1, 8))::UBIGINT::BIGINT)"


# ---------------------------------------------------------------- token counts

def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    low = F.lower(t)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(t).cast("long").alias("n_chars"),
        F.size(F.regexp_extract_all(t, F.lit(WS_RE), 0)).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(WORD_RE), 0)).cast("long").alias("word_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(BPE_RE), 0)).cast("long").alias("bpe_tokens"),
    )


def token_counts_oracle_sql(table: str = "documents", text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    return f"""
SELECT {id_col} AS doc_id,
       length({text_col}) AS n_chars,
       len(regexp_extract_all({text_col}, '{WS_RE}')) AS ws_tokens,
       len(regexp_extract_all(lower({text_col}), '{WORD_RE}')) AS word_tokens,
       len(regexp_extract_all(lower({text_col}), '{BPE_RE}')) AS bpe_tokens
FROM {table}
"""


# --------------------------------------------------------------- quality score

#: markers kept small & pinned so the oracle SQL stays readable
_STOPWORDS = sorted(ENGLISH_STOPWORDS)


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic document-quality scoring (length / punctuation / stopword
    ratios), the standard pre-training corpus filter shape (C4/Gopher-style
    rules, computed fully JVM-side)."""
    t = F.col(text_col)
    low = F.lower(t)
    words = F.regexp_extract_all(low, F.lit(WORD_RE), 0)
    sw = F.array([F.lit(w) for w in _STOPWORDS])
    n_words = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    n_chars = F.length(t)
    n_punct = F.size(F.regexp_extract_all(low, F.lit("[^a-z0-9_ \\t\\n\\r]"), 0))
    # ratios and the composite score are integer basis points (bp, /10000)
    # via integer division: bit-identical across engines, no float-rounding
    # boundary cases (compounded float weights round differently between
    # Spark's BigDecimal HALF_UP and DuckDB's multiply-then-round).
    L = lambda c: c.cast("long")
    div = lambda num, den: F.floor(num / den).cast("long")
    word_bp = div(L(n_words) * 10000, F.greatest(L(n_chars), F.lit(1)))
    stop_bp = div(L(n_stop) * 10000, F.greatest(L(n_words), F.lit(1)))
    punct_bp = div(L(n_punct) * 10000, F.greatest(L(n_chars), F.lit(1)))
    quality = (
        F.least(L(n_words) * 8, F.lit(400))                       # 0..400
        + (F.lit(300) - F.least(div(punct_bp * 300, F.lit(2000)), F.lit(300)))
        + F.least(div(stop_bp * 300, F.lit(2500)), F.lit(300))
    ).cast("long")                                                # 0..1000
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        n_stop.cast("long").alias("n_stopwords"),
        n_punct.cast("long").alias("n_punct"),
        word_bp.alias("word_ratio_bp"),
        stop_bp.alias("stop_ratio_bp"),
        quality.alias("quality"),
    )


def quality_scores_oracle_sql(table: str = "documents", text_col: str = "text",
                              id_col: str = "doc_id") -> str:
    sw = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         length({text_col}) AS n_chars,
         regexp_extract_all(lower({text_col}), '{WORD_RE}') AS words,
         len(regexp_extract_all(lower({text_col}), '[^a-z0-9_ \\t\\n\\r]')) AS n_punct
  FROM {table}
),
m AS (
  SELECT doc_id, n_chars, len(words) AS n_words,
         len(list_filter(words, w -> list_contains([{sw}], w))) AS n_stopwords,
         n_punct
  FROM base
)
SELECT doc_id, n_chars, n_words, n_stopwords, n_punct,
       (n_words * 10000 // GREATEST(n_chars, 1))::BIGINT AS word_ratio_bp,
       (n_stopwords * 10000 // GREATEST(n_words, 1))::BIGINT AS stop_ratio_bp,
       (LEAST(n_words * 8, 400)
        + (300 - LEAST((n_punct * 10000 // GREATEST(n_chars, 1)) * 300 // 2000, 300))
        + LEAST((n_stopwords * 10000 // GREATEST(n_words, 1)) * 300 // 2500, 300)
       )::BIGINT AS quality
FROM m
"""


# -------------------------------------------------------------------- lang id

#: (lang, marker words) — high-frequency function words per language.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "and", "of", "to", "is", "in", "that", "it", "for"]),
    ("fr", ["le", "la", "les", "et", "de", "des", "un", "une", "est", "que"]),
    ("es", ["el", "los", "las", "y", "en", "que", "un", "una", "es", "por"]),
    ("de", ["der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"]),
]


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: score = count of per-language marker
    words among the doc's tokens; Han-script char count triggers 'zh';
    argmax with ties broken by marker-list order; no signal -> 'und'.

    (On the synthetic test corpus every doc shares one English-like
    vocabulary, so the heuristic mostly answers 'en' — the operator contract
    is the deterministic computation, not corpus ground truth.)
    """
    t = F.col(text_col)
    words = F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0)
    scores = []
    for lang, markers in LANG_MARKERS:
        arr = F.array([F.lit(m) for m in markers])
        scores.append(
            F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
            .cast("long").alias(f"score_{lang}"))
    han = F.size(F.regexp_extract_all(t, F.lit("[\\x{4e00}-\\x{9fff}]"), 0))

    base = docs.select(F.col(id_col).alias("doc_id"), han.cast("long").alias("han_chars"), *scores)
    best = F.greatest(*[F.col(f"score_{l}") for l, _ in LANG_MARKERS])
    pred = F.when(F.col("han_chars") > 0, F.lit("zh"))
    for lang, _ in LANG_MARKERS:
        pred = pred.when((best > 0) & (F.col(f"score_{lang}") == best), F.lit(lang))
    pred = pred.otherwise(F.lit("und"))
    return base.select("doc_id", "han_chars",
                       *[f"score_{l}" for l, _ in LANG_MARKERS],
                       pred.alias("lang_pred"))


def lang_id_oracle_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    score_cols = []
    for lang, markers in LANG_MARKERS:
        lst = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"len(list_filter(words, w -> list_contains([{lst}], w))) AS score_{lang}")
    best = "GREATEST(" + ", ".join(f"score_{l}" for l, _ in LANG_MARKERS) + ")"
    cases = "\n         ".join(
        f"WHEN {best} > 0 AND score_{l} = {best} THEN '{l}'"
        for l, _ in LANG_MARKERS)
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{WORD_RE}') AS words,
         len(regexp_extract_all({text_col}, '[\\x{{4e00}}-\\x{{9fff}}]')) AS han_chars
  FROM {table}
),
scored AS (
  SELECT doc_id, han_chars, {", ".join(score_cols)}
  FROM base
)
SELECT doc_id, han_chars, {", ".join(f"score_{l}" for l, _ in LANG_MARKERS)},
       CASE WHEN han_chars > 0 THEN 'zh'
         {cases}
         ELSE 'und' END AS lang_pred
FROM scored
"""


# ------------------------------------------------------------- fingerprinting

FP_K = 3   # k-gram size (words)
FP_W = 4   # winnowing window (hashes)


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Winnowing fingerprints: hash every k-word shingle, keep the minimum
    hash of each sliding window of FP_W consecutive shingles (ties -> the
    rightmost, i.e. the window min computed over a ROWS BETWEEN frame),
    output per-doc distinct-fingerprint count and an order-independent
    checksum. Shuffle-free until the final per-doc aggregate."""
    from pyspark.sql import Window
    # One shuffle total: hash-partition the (small) doc rows by doc_id
    # FIRST, so the exploded shingle stream, the window, the distinct and
    # the per-doc aggregate all reuse that partitioning (Catalyst sees
    # hashpartitioning(doc_id) already satisfies their required
    # distribution). The md5 hash runs post-explode as a codegen'd scalar
    # expression — never inside an interpreted higher-order function.
    par = max(docs.sparkSession.sparkContext.defaultParallelism, 8)
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    base = (docs.repartition(par, F.col(id_col))
            .select(F.col(id_col).alias("doc_id"), words.alias("words")))
    sh = base.select(
        "doc_id",
        F.posexplode(
            F.when(F.size("words") >= FP_K,
                   F.transform(
                       F.sequence(F.lit(0), F.size("words") - FP_K),
                       lambda i: F.concat_ws(
                           " ", *[F.element_at(F.col("words"), (i + j + 1).cast("int"))
                                  for j in range(FP_K)])))
            .otherwise(F.array())).alias("pos", "shingle"))
    hashed = sh.select("doc_id", "pos", hash32_col(F.col("shingle")).alias("h"))
    w = (Window.partitionBy("doc_id").orderBy("pos")
         .rowsBetween(-(FP_W - 1), 0))
    fps = (hashed
           .withColumn("win_min", F.min("h").over(w))
           .filter(F.col("pos") >= FP_W - 1)
           .select("doc_id", F.col("win_min").alias("fp"))
           .distinct())
    return (fps.groupBy("doc_id")
            .agg(F.count("*").alias("n_fingerprints"),
                 F.sum("fp").alias("fp_checksum"),
                 F.min("fp").alias("fp_min"))
            .orderBy("doc_id"))


def fingerprints_oracle_sql(table: str = "documents", text_col: str = "text",
                            id_col: str = "doc_id") -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{WORD_RE}') AS words
  FROM {table}
),
sh AS (
  SELECT doc_id,
         unnest(range(0, GREATEST(len(words) - {FP_K - 1}, 0))) AS pos,
         unnest(list_transform(range(1, GREATEST(len(words) - {FP_K - 1}, 0) + 1),
                i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingle
  FROM base
  WHERE len(words) >= {FP_K}
),
hashed AS (
  SELECT doc_id, pos, {hash32_sql('shingle')} AS h FROM sh
),
winmin AS (
  SELECT doc_id, pos,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {FP_W - 1} PRECEDING AND CURRENT ROW) AS fp
  FROM hashed
),
fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin WHERE pos >= {FP_W - 1}
)
SELECT doc_id, count(*)::BIGINT AS n_fingerprints, SUM(fp)::BIGINT AS fp_checksum,
       MIN(fp) AS fp_min
FROM fps GROUP BY doc_id ORDER BY doc_id
"""


# ------------------------------------------------------- repetition stats

REP_TOP_NS = (2, 3)   # top-n-gram char-fraction sizes (Gopher table A1)
REP_DUP_N = 5         # duplicate-n-gram occurrence-fraction size


def _repetition_kernel(doc_ids, texts):
    """Per-batch Gopher repetition stats. Pure Python over one Arrow batch;
    O(total text length) per doc via Counter runs — the earlier Catalyst
    sorted-fold version built O(T) n-gram arrays through interpreted
    higher-order expressions and measured ~15 ms/doc; this kernel is ~50x
    faster on the same corpus with identical integer outputs."""
    import re
    from collections import Counter

    word_re = re.compile(WORD_RE)
    rows = {k: [] for k in ("doc_id", "n_lines", "dup_line_bp",
                            "dup_line_char_bp", "top2gram_char_bp",
                            "top3gram_char_bp", "dup5gram_bp")}
    bp = lambda num, den: (10000 * num) // max(den, 1)
    for did, text in zip(doc_ids, texts):
        text = text or ""
        words = word_re.findall(text.lower())
        lines = [ln for ln in text.split("\n") if ln != ""]
        n_lines = len(lines)
        line_chars = sum(map(len, lines))
        word_chars = sum(map(len, words))
        lc = Counter(lines)
        dup_ln = sum(c for c in lc.values() if c > 1)
        dup_lc = sum(c * len(ln) for ln, c in lc.items() if c > 1)

        tops = {}
        for n in REP_TOP_NS:
            if len(words) >= n:
                cnt = Counter(" ".join(words[i:i + n])
                              for i in range(len(words) - n + 1))
                best = max(cnt.values())
                # tie rule: lexicographically smallest gram with max count
                bestg = min(g for g, c in cnt.items() if c == best)
                tops[n] = bp(best * (len(bestg) - (n - 1)), word_chars)
            else:
                tops[n] = 0
        n5 = max(len(words) - (REP_DUP_N - 1), 0)
        if n5 > 0:
            c5 = Counter(" ".join(words[i:i + REP_DUP_N])
                         for i in range(n5))
            dup5 = sum(c for c in c5.values() if c > 1)
        else:
            dup5 = 0

        rows["doc_id"].append(did)
        rows["n_lines"].append(n_lines)
        rows["dup_line_bp"].append(bp(dup_ln, n_lines))
        rows["dup_line_char_bp"].append(bp(dup_lc, line_chars))
        rows["top2gram_char_bp"].append(tops[2])
        rows["top3gram_char_bp"].append(tops[3])
        rows["dup5gram_bp"].append(bp(dup5, n5))
    return rows


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    table A1), the standard "remove auto-generated / boilerplate pages"
    pre-training filter:

    - ``dup_line_bp`` / ``dup_line_char_bp`` — fraction (basis points) of
      non-empty lines that are occurrences of a repeated line, and of
      line characters inside those occurrences;
    - ``top2gram_char_bp`` / ``top3gram_char_bp`` — fraction of word
      characters covered by the single most frequent word 2-/3-gram
      (count x gram-chars-sans-spaces / total word chars; can exceed
      10000 bp when occurrences overlap — ties go to the
      lexicographically smallest gram);
    - ``dup5gram_bp`` — fraction of word 5-gram occurrences that are
      occurrences of a repeated 5-gram (occurrence-based, not Gopher's
      char-marking variant — documented simplification).

    100 TB shape: an Arrow-batched ``mapInPandas`` pure map over input
    splits — zero shuffles except the final presentation ``orderBy``
    (driver-contract determinism; drop it for pipeline use). Counter-run
    counting is O(total text bytes) per doc, vs the O(T log T) sorted
    Catalyst folds this replaced, which fell out of codegen into
    interpreted higher-order evaluation at ~15 ms/doc. Integer basis
    points keep it bit-identical to the DuckDB twin (corpus contract is
    ASCII text, where JVM/Python/DuckDB lower() and string order agree).
    """
    import pandas as pd
    from pyspark.sql import types as T

    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType([T.StructField("doc_id", id_type)] + [
        T.StructField(f, T.LongType())
        for f in ("n_lines", "dup_line_bp", "dup_line_char_bp",
                  "top2gram_char_bp", "top3gram_char_bp", "dup5gram_bp")])

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                _repetition_kernel(pdf["doc_id"].tolist(),
                                   pdf["text"].tolist()))

    pruned = docs.select(F.col(id_col).alias("doc_id"),
                         F.col(text_col).alias("text"))
    return pruned.mapInPandas(run, out_schema).orderBy("doc_id")


def repetition_stats_oracle_sql(table: str = "documents",
                                text_col: str = "text",
                                id_col: str = "doc_id") -> str:
    def gram_cte(n: int, name: str) -> str:
        return f"""
{name} AS (
  SELECT doc_id, unnest([array_to_string(w[i:i+{n - 1}], ' ')
                         for i in range(1, GREATEST(len(w) - {n - 2}, 1))]) AS g
  FROM toks
),
{name}c AS (SELECT doc_id, g, count(*) AS c FROM {name} GROUP BY doc_id, g)"""

    top_sel = []
    for n in REP_TOP_NS:
        top_sel.append(f"""
g{n}top AS (
  SELECT doc_id, c, length(g) AS glen
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, g ASC) AS rn
        FROM g{n}c)
  WHERE rn = 1
)""")
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {text_col} AS text FROM {table}
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS w FROM base
),
lines AS (
  SELECT doc_id, l AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l FROM base)
  WHERE l <> ''
),
lc AS (
  SELECT doc_id, line, count(*) AS c, length(line) AS len
  FROM lines GROUP BY doc_id, line
),
lagg AS (
  SELECT doc_id,
         SUM(c) AS n_lines,
         SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_lines,
         SUM(c * len) AS line_chars,
         SUM(CASE WHEN c > 1 THEN c * len ELSE 0 END) AS dup_chars
  FROM lc GROUP BY doc_id
),
wc AS (
  SELECT doc_id, length(array_to_string(w, '')) AS word_chars,
         GREATEST(len(w) - {REP_DUP_N - 1}, 0) AS n5
  FROM toks
),{gram_cte(2, "g2")},{gram_cte(3, "g3")},{",".join(top_sel)},
{gram_cte(REP_DUP_N, "g5")},
g5agg AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup5
  FROM g5c GROUP BY doc_id
)
SELECT b.doc_id,
       COALESCE(l.n_lines, 0)::BIGINT AS n_lines,
       (10000 * COALESCE(l.dup_lines, 0)
        // GREATEST(COALESCE(l.n_lines, 0), 1))::BIGINT AS dup_line_bp,
       (10000 * COALESCE(l.dup_chars, 0)
        // GREATEST(COALESCE(l.line_chars, 0), 1))::BIGINT AS dup_line_char_bp,
       (10000 * COALESCE(t2.c, 0) * GREATEST(COALESCE(t2.glen, 0) - 1, 0)
        // GREATEST(w.word_chars, 1))::BIGINT AS top2gram_char_bp,
       (10000 * COALESCE(t3.c, 0) * GREATEST(COALESCE(t3.glen, 0) - 2, 0)
        // GREATEST(w.word_chars, 1))::BIGINT AS top3gram_char_bp,
       (10000 * COALESCE(g5.dup5, 0)
        // GREATEST(w.n5, 1))::BIGINT AS dup5gram_bp
FROM base b
LEFT JOIN lagg l USING (doc_id)
LEFT JOIN wc w USING (doc_id)
LEFT JOIN g2top t2 USING (doc_id)
LEFT JOIN g3top t3 USING (doc_id)
LEFT JOIN g5agg g5 USING (doc_id)
ORDER BY b.doc_id
"""


# ------------------------------------------- chunk-level exact dedup stats

CHUNK_WORDS = 16


def chunk_dup_stats(docs: DataFrame, window: int = CHUNK_WORDS,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Exact substring-duplication stats per document: split each doc into
    non-overlapping ``window``-word chunks (the Lee et al. 2022 exact
    substring dedup shape, trailing partial chunk kept), mark a chunk
    duplicated when the identical chunk text appears anywhere else in the
    corpus (other docs OR repeated within the same doc = boilerplate /
    self-repetition), and report (n_chunks, n_dup_chunks, dup_ratio_bp).

    100 TB shape: the only shuffle is the chunk-hash groupBy for corpus
    frequencies (map-side combinable) plus a doc_id re-aggregation — no
    pairwise anything; this is the standard pre-filter before paying for
    suffix-array/minhash passes."""
    words = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    base = docs.select(F.col(id_col).alias("doc_id"), words.alias("words"))
    n_chunks = F.ceil(F.size("words") / F.lit(window)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.array_join(
            F.slice(F.col("words"), (i - 1) * window + 1, window), " "))
    ex = (base.filter(F.size("words") > 0)
          .select("doc_id", F.explode(chunks).alias("chunk")))
    freq = ex.groupBy("chunk").agg(F.count("*").alias("freq"))
    per_doc = (ex.join(freq, "chunk")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_chunks"),
                    F.sum(F.when(F.col("freq") > 1, 1).otherwise(0))
                    .cast("long").alias("n_dup_chunks")))
    return (per_doc.select(
        "doc_id", "n_chunks",
        "n_dup_chunks",
        F.floor(F.lit(10000) * F.col("n_dup_chunks") / F.col("n_chunks"))
        .cast("long").alias("dup_ratio_bp"))
        .orderBy("doc_id"))


def chunk_dup_stats_oracle_sql(window: int = CHUNK_WORDS,
                               table: str = "documents",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id,
         regexp_extract_all(lower({text_col}), '{WORD_RE}') AS words
  FROM {table}
),
ex AS (
  SELECT doc_id,
         unnest(list_transform(
           range(1, CAST(ceil(len(words) / {window}.0) AS INT) + 1),
           i -> array_to_string(words[(i - 1) * {window} + 1 :
                                      (i - 1) * {window} + {window}], ' ')
         )) AS chunk
  FROM base WHERE len(words) > 0
),
freq AS (SELECT chunk, count(*) AS freq FROM ex GROUP BY chunk)
SELECT e.doc_id,
       count(*)::INT AS n_chunks,
       SUM(CASE WHEN f.freq > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       FLOOR(10000 * SUM(CASE WHEN f.freq > 1 THEN 1 ELSE 0 END)
             / count(*))::BIGINT AS dup_ratio_bp
FROM ex e JOIN freq f USING (chunk)
GROUP BY e.doc_id ORDER BY e.doc_id
"""


# Gopher rule thresholds (Rae et al. 2021, table A1), integer basis
# points. Rules map onto the columns quality_scores/repetition_stats
# already emit; mean-word-length and the 4-gram rule are not represented
# (documented simplification — the underlying signals aren't computed).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_STOPWORDS = 2
GOPHER_MAX_PUNCT_BP = 1500          # symbol-to-char ratio <= 0.15
GOPHER_MAX_DUP_LINE_BP = 3000       # duplicate-line fraction <= 0.30
GOPHER_MAX_DUP_LINE_CHAR_BP = 2000  # chars in duplicate lines <= 0.20
GOPHER_MAX_TOP2GRAM_BP = 2000       # top 2-gram char cover <= 0.20
GOPHER_MAX_TOP3GRAM_BP = 1800       # top 3-gram char cover <= 0.18
GOPHER_MAX_DUP5GRAM_BP = 1500       # repeated 5-gram occurrences <= 0.15


def gopher_quality_filter(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """The composed keep/drop verdict a pre-training pipeline actually
    applies: Gopher quality + repetition rules over the signals of
    :func:`quality_scores` and :func:`repetition_stats`, one bit per
    failed rule. Output: (doc_id, keep 0/1, fail_mask) — ``fail_mask``
    bit i set means rule i failed (bits: 0 too-few-words, 1
    too-many-words, 2 too-few-stopwords, 3 symbol-heavy, 4 dup-lines,
    5 dup-line-chars, 6 top-2-gram, 7 top-3-gram, 8 dup-5-grams).

    100 TB shape: both inputs are pure maps over input splits; the only
    shuffle is their doc_id equi-join, which co-partitions two slim
    integer-stat streams (never the text)."""
    q = quality_scores(docs, text_col, id_col)
    r = repetition_stats(docs, text_col, id_col)
    j = q.join(r, "doc_id")
    punct_bp = F.floor((F.col("n_punct") * 10000)
                       / F.greatest(F.col("n_chars"), F.lit(1))).cast("long")
    rules = [
        F.col("n_words") < GOPHER_MIN_WORDS,
        F.col("n_words") > GOPHER_MAX_WORDS,
        F.col("n_stopwords") < GOPHER_MIN_STOPWORDS,
        punct_bp > GOPHER_MAX_PUNCT_BP,
        F.col("dup_line_bp") > GOPHER_MAX_DUP_LINE_BP,
        F.col("dup_line_char_bp") > GOPHER_MAX_DUP_LINE_CHAR_BP,
        F.col("top2gram_char_bp") > GOPHER_MAX_TOP2GRAM_BP,
        F.col("top3gram_char_bp") > GOPHER_MAX_TOP3GRAM_BP,
        F.col("dup5gram_bp") > GOPHER_MAX_DUP5GRAM_BP,
    ]
    mask = None
    for i, cond in enumerate(rules):
        bit = F.when(cond, F.lit(1 << i)).otherwise(F.lit(0))
        mask = bit if mask is None else mask + bit
    mask = mask.cast("long")
    return (j.select(F.col("doc_id"), mask.alias("fail_mask"))
            .select("doc_id",
                    F.when(F.col("fail_mask") == 0, F.lit(1))
                    .otherwise(F.lit(0)).cast("long").alias("keep"),
                    "fail_mask")
            .orderBy("doc_id"))


def gopher_quality_filter_oracle_sql(table: str = "documents",
                                     text_col: str = "text",
                                     id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`gopher_quality_filter` — the same integer
    rules over the two stat oracles joined on doc_id."""
    qsql = quality_scores_oracle_sql(table, text_col, id_col)
    rsql = repetition_stats_oracle_sql(table, text_col, id_col)
    conds = [
        f"q.n_words < {GOPHER_MIN_WORDS}",
        f"q.n_words > {GOPHER_MAX_WORDS}",
        f"q.n_stopwords < {GOPHER_MIN_STOPWORDS}",
        f"(10000 * q.n_punct // GREATEST(q.n_chars, 1)) > {GOPHER_MAX_PUNCT_BP}",
        f"r.dup_line_bp > {GOPHER_MAX_DUP_LINE_BP}",
        f"r.dup_line_char_bp > {GOPHER_MAX_DUP_LINE_CHAR_BP}",
        f"r.top2gram_char_bp > {GOPHER_MAX_TOP2GRAM_BP}",
        f"r.top3gram_char_bp > {GOPHER_MAX_TOP3GRAM_BP}",
        f"r.dup5gram_bp > {GOPHER_MAX_DUP5GRAM_BP}",
    ]
    mask = " + ".join(f"(CASE WHEN {c} THEN {1 << i} ELSE 0 END)"
                      for i, c in enumerate(conds))
    return f"""
SELECT doc_id,
       (CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END)::BIGINT AS keep,
       fail_mask
FROM (
  SELECT q.doc_id, ({mask})::BIGINT AS fail_mask
  FROM ({qsql}) q JOIN ({rsql}) r USING (doc_id)
)
ORDER BY doc_id
"""
