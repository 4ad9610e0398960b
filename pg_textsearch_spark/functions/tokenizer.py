"""Text-config tokenization pipeline (PG ``to_tsvector`` contract).

Reproduces the tokenization contract the reference delegates to Postgres
(reference: src/access/build.c:734-1059, README.md:581-589):

- word extraction + lowercasing,
- optional stopword removal + Snowball-English stemming
  (config ``english``; config ``simple`` = lowercase only),
- words longer than 2047 chars dropped (PG MAXSTRLEN),
- term frequency = number of positions, saturated at 256 per lexeme per
  chunk (PG MAXNUMPOS),
- documents larger than 256 KB are split at the last ASCII whitespace of
  each 256 KB window, chunk-tokenized, and per-term frequencies merged
  (reference: src/access/build.c:807-812, 867-898, 921-972).

Word pattern: ``[a-z0-9_]+`` over the lowercased text. This is our pinned
tokenizer contract — it is deliberately SQL-expressible so the same
tokenization can run as a DuckDB/Spark-SQL oracle (the reference pins
``to_tsvector`` the same way in test/sql/validation.sql). PG's full parser
(urls, hwords, ...) is a stretch goal tracked in SURVEY.md §7.3.

Execution model: ``tokenize_series`` is called from Arrow-batched UDFs
(``mapInPandas``) — per-batch it dedupes tokens before stemming so the
stemmer runs O(unique terms), and all counting is C-level (collections /
numpy), never per-row Python in the hot loop beyond the regex scan itself.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable

from .stemmer import stem
from .stemmer_intl import stem_french, stem_german, stem_spanish
from .stopwords_intl import (FRENCH_STOPWORDS, GERMAN_STOPWORDS,
                             SPANISH_STOPWORDS)

__all__ = [
    "TOKEN_PATTERN", "MAX_WORD_LEN", "MAX_TF", "CHUNK_BYTES",
    "ENGLISH_STOPWORDS", "tokenize", "tokenize_query", "sql_token_expr",
    "resolve_config",
]

TOKEN_PATTERN = re.compile(r"[a-z0-9_]+")
# fr/de/es documents need the accented Latin-1 letters (à-ÿ plus ß) as
# word characters or stemming is meaningless; ASCII configs keep the
# narrow SQL-oracle-friendly pattern above.
TOKEN_PATTERN_LATIN1 = re.compile(r"[a-z0-9_ß-ÿ]+")
MAX_WORD_LEN = 2047   # PG MAXSTRLEN: longer words are dropped
MAX_TF = 256          # PG MAXNUMPOS: positions cap per lexeme per chunk
CHUNK_BYTES = 256 * 1024

# Snowball English stopword list (public; what PG's 'english' config uses).
ENGLISH_STOPWORDS = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves he
him his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing a an the and but if or
because as until while of at by for with about against between into through
during before after above below to from up down in out on off over under
again further then once here there when where why how all any both each few
more most other some such no nor not only own same so than too very s t can
will just don should now
""".split())

# config name -> (token pattern, stopwords | None, stemmer | None).
# Stemmers are the published Snowball algorithms (PG's to_tsvector
# contract); stopword lists are the Snowball-project lists PG ships.
# The sentinel pattern "pg" selects the PG default-parser behavioral
# clone (functions.pg_parser): urls/emails/hosts/files/versions/signed
# numbers/hyphen compounds, PG-15-parity-tested. 'pg' = default parser +
# simple dictionary; 'pg_english' = default parser + english stopwords +
# Snowball stemming on word-ish lexemes (PG's english config shape).
_CONFIGS = {
    "simple": (TOKEN_PATTERN, None, None),
    "english": (TOKEN_PATTERN, ENGLISH_STOPWORDS, stem),
    "french": (TOKEN_PATTERN_LATIN1, FRENCH_STOPWORDS, stem_french),
    "german": (TOKEN_PATTERN_LATIN1, GERMAN_STOPWORDS, stem_german),
    "spanish": (TOKEN_PATTERN_LATIN1, SPANISH_STOPWORDS, stem_spanish),
    "pg": ("pg", None, None),
    "pg_english": ("pg", ENGLISH_STOPWORDS, stem),
}


def config_parts(config: str):
    """(token regex, stopword frozenset | None, stem fn | None) for a
    config — the pieces oracle generators need to SHARE the tokenizer with
    the SQL oracle (the reference shares to_tsvector the same way)."""
    return _CONFIGS[resolve_config(config)]


def resolve_config(config: str) -> str:
    """Accept PG qualified names ('pg_catalog.english' — reference
    test/sql/text_config.sql) and validate."""
    name = config.split(".", 1)[1] if config.startswith("pg_catalog.") \
        else config
    if name not in _CONFIGS:
        raise ValueError(f"unknown text_config {config!r}; "
                         f"supported: {tuple(_CONFIGS)}")
    return name


def _split_chunks(text: str) -> list[str]:
    """Split texts > 256 KB at the last ASCII whitespace of each window."""
    data = text.encode("utf-8", errors="ignore")
    if len(data) <= CHUNK_BYTES:
        return [text]
    chunks: list[str] = []
    pos = 0
    n = len(data)
    while pos < n:
        end = min(pos + CHUNK_BYTES, n)
        if end < n:
            window = data[pos:end]
            cut = max(window.rfind(b" "), window.rfind(b"\n"),
                      window.rfind(b"\t"), window.rfind(b"\r"))
            if cut > 0:
                end = pos + cut
        chunks.append(data[pos:end].decode("utf-8", errors="ignore"))
        pos = end
    return chunks


# bytes fast path for the ASCII token class: every byte outside [a-z0-9_]
# becomes a space (UTF-8 lead/continuation bytes are all >= 0x80, so
# non-ASCII codepoints split tokens exactly like the regex does)
_ASCII_TOKEN_TABLE = bytes(
    c if (97 <= c <= 122 or 48 <= c <= 57 or c == 95) else 32
    for c in range(256))


def _chunk_term_freqs(chunk: str, config: str, stem_cache: dict[str, str | None]) -> Counter:
    """(lexeme -> tf) for one chunk; tf saturates at MAX_TF per chunk."""
    pattern, stopwords, stem_fn = _CONFIGS[config]
    if pattern == "pg":
        return _pg_chunk_term_freqs(chunk, stopwords, stem_fn, stem_cache)
    if pattern is TOKEN_PATTERN:
        # lower -> utf-8 -> translate -> split is ~1.5x the regex findall
        # (measured on the 400k source-code corpus) and token-identical to
        # it: tokens are pure-ASCII runs, and byte order == codepoint
        # order for [a-z0-9_]. Decodes happen once per UNIQUE word via the
        # shared cache (bytes keys can't collide with the str keys other
        # paths put in the same dict).
        raw = Counter(chunk.lower().encode("utf-8", "ignore")
                      .translate(_ASCII_TOKEN_TABLE).split())
        if stem_fn is None:
            out: Counter = Counter()
            # bulk decode: ONE join/decode/split for all unique words
            # beats 1.8M per-word dict ops (measured 1.85s -> ~0.5s per
            # 20k docs). No word can exceed MAX_WORD_LEN when the whole
            # chunk is shorter; only then scan for oversized words.
            if len(chunk) > MAX_WORD_LEN and raw and \
                    max(map(len, raw)) > MAX_WORD_LEN:
                for bword, cnt in raw.items():
                    if len(bword) > MAX_WORD_LEN:
                        continue
                    out[bword.decode("ascii")] = \
                        cnt if cnt <= MAX_TF else MAX_TF
                return out
            words = b" ".join(raw).decode("ascii").split(" ") if raw else []
            out.update({w: (c if c <= MAX_TF else MAX_TF)
                        for w, c in zip(words, raw.values())})
            return out
        # stemmed configs: pull the whole lexeme column with map(dict.get)
        # (C-speed; None marks a cache miss, False a dropped word), resolve
        # misses in a rare slow pass, then one cheap zip loop — no min()
        # call or Counter.__missing__ per word (measured 1.34 -> ~2 M
        # tokens/s steady-state on natural prose)
        lexes = list(map(stem_cache.get, raw.keys()))
        if None in lexes:
            for pos_i, (bword, lex) in enumerate(zip(raw.keys(), lexes)):
                if lex is not None:
                    continue
                word = bword.decode("ascii")
                if len(word) > MAX_WORD_LEN or \
                        (stopwords and word in stopwords):
                    lex = False
                else:
                    lex = stem_fn(word)
                stem_cache[bword] = lex
                lexes[pos_i] = lex
        od = {}
        for lex, cnt in zip(lexes, raw.values()):
            if lex is False:
                continue
            if cnt > MAX_TF:
                cnt = MAX_TF
            if lex in od:
                od[lex] += cnt
            else:
                od[lex] = cnt
        return od
    raw = Counter(pattern.findall(chunk.lower()))
    out: Counter = Counter()
    if stem_fn is None:
        for word, cnt in raw.items():
            if len(word) > MAX_WORD_LEN:
                continue
            out[word] += min(cnt, MAX_TF)
        return out
    for word, cnt in raw.items():
        lex = stem_cache.get(word, "?")
        if lex == "?":
            if len(word) > MAX_WORD_LEN or (stopwords and word in stopwords):
                lex = None
            else:
                lex = stem_fn(word)
            stem_cache[word] = lex
        if lex is None:
            continue
        out[lex] += min(cnt, MAX_TF)
    return out


def _pg_chunk_term_freqs(chunk: str, stopwords, stem_fn,
                         stem_cache: dict) -> Counter:
    """PG-default-parser chunk tokenization: lexemes come typed from
    pg_parse_typed; only the stemmable word classes see stopwords and the
    stemmer (PG english-config dictionary mapping), everything else passes
    through the simple dictionary."""
    from .pg_parser import pg_parse_typed
    raw: Counter = Counter()
    stem_ok: dict[str, bool] = {}
    for lex, _pos, stemmable in pg_parse_typed(chunk):
        raw[lex] += 1
        stem_ok[lex] = stemmable
    out: Counter = Counter()
    # same order as the regex configs: per-WORD tf cap, then stem-merge
    for word, cnt in raw.items():
        if stem_fn is not None and stem_ok[word]:
            lex = stem_cache.get(word, "?")
            if lex == "?":
                lex = (None if (stopwords and word in stopwords)
                       else stem_fn(word))
                stem_cache[word] = lex
            if lex is None:
                continue
        else:
            lex = word
        out[lex] += min(cnt, MAX_TF)
    return out


def tokenize(text: str | None, config: str = "english",
             stem_cache: dict | None = None) -> tuple[list[str], list[int], int]:
    """text -> (sorted lexemes, tfs, doc_length). doc_length = Σ tf (raw).

    Mirrors the reference's tp_tokenize_text contract
    (src/access/build.c:974-1059): chunk, per-chunk tokenize with the tf
    cap, then merge chunk frequencies by term.
    """
    config = resolve_config(config)
    if not text:
        return [], [], 0
    if stem_cache is None:
        stem_cache = {}
    if len(text) * 4 <= CHUNK_BYTES:
        # <= CHUNK_BYTES/4 chars can't exceed CHUNK_BYTES utf-8 bytes:
        # skip _split_chunks' full encode AND the Counter merge copy —
        # the overwhelmingly common case
        merged = _chunk_term_freqs(text, config, stem_cache)
    else:
        merged = Counter()
        for chunk in _split_chunks(text):
            merged.update(_chunk_term_freqs(chunk, config, stem_cache))
    if not merged:
        return [], [], 0
    terms = sorted(merged)
    tfs = [merged[t] for t in terms]
    return terms, tfs, int(sum(tfs))


def tokenize_batch(texts: Iterable[str | None], config: str = "english"):
    """Tokenize a batch sharing one stem cache (for Arrow UDFs)."""
    cache: dict = {}
    return [tokenize(t, config, cache) for t in texts]


def tokenize_query(query: str, config: str = "english") -> list[tuple[str, int]]:
    """query text -> [(term, query_freq)]; multiplicity weights the term
    (reference: src/types/query.c:963-967)."""
    terms, tfs, _ = tokenize(query, config)
    return list(zip(terms, tfs))


def parse_tpquery(s: str) -> tuple[str | None, str]:
    """Parse the reference's colon query-constructor syntax
    (``'index_name:query text'`` — src/types/query.c:194-225): a colon not
    at position 0 splits the string into (index_name, query); otherwise the
    whole string is the query with no index binding."""
    colon = s.find(":")
    if colon > 0:
        return s[:colon], s[colon + 1:]
    return None, s


def sql_token_expr(text_col: str) -> str:
    """DuckDB/ANSI expression producing this tokenizer's token list for the
    ``simple`` config — used to build oracle SQL that shares the tokenizer
    with the engine (the reference oracle shares to_tsvector the same way,
    test/sql/validation.sql:1-12)."""
    return f"regexp_extract_all(lower({text_col}), '[a-z0-9_]+')"
