"""Standing-query percolation — route documents to registered queries.

The inverse of search: K queries are registered ONCE with frozen corpus
statistics (idf / avgdl from an existing :class:`Bm25Index` or a
reference corpus), then every incoming document — a batch DataFrame or a
Structured Streaming micro-batch — is BM25-scored against ALL standing
queries in a single pass. This is the alerting/routing shape a crawl
pipeline needs ("send every page matching my topic queries to bucket X"),
the streaming analogue of the reference's standalone ``text <@>
bm25query`` projection (reference: src/types/query.c:665-1118) with the
document side streaming instead of the query side.

Scale shape (100 TB): ZERO shuffles and ZERO state. One Arrow tokenizer
pass (``doc_term_arrays``, one row per doc), a broadcast nested-loop join
against the K-row standing-query table, and a whole-stage-codegen'd
``F.aggregate`` over each query's terms with ``element_at`` map lookups.
Every operator is narrow, so the plan is embarrassingly parallel across
input splits, and the STREAMING form needs no watermark: append-mode safe
on any source because nothing aggregates across documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import Bm25Options
from ..functions.tokenizer import tokenize_query
from ..operators.exhaustive import idf_value
from ..spark_utils import doc_postings, doc_term_arrays, quantize_len_col

__all__ = ["Percolator", "percolate_oracle_sql"]


class Percolator:
    """K standing BM25 queries with frozen corpus statistics.

    ``queries``: list of query strings (query_id = position) .
    ``stats``: dict with ``n_docs``, ``avgdl`` and ``df`` (term -> doc
    freq for every standing-query term). Use :meth:`from_index` to freeze
    stats from a built index (the production shape: corpus indexed, new
    docs routed) or :meth:`from_corpus` to compute them from a DataFrame.

    Lifecycle: :meth:`add_queries` / :meth:`remove_queries` mutate the
    standing set WITHOUT refreezing corpus statistics — only the K-row
    query table is rebuilt (and re-broadcast on the next ``matches``
    plan). Query ids are stable: removal leaves a tombstoned slot, new
    queries always get fresh ids. An already-RUNNING streaming query
    keeps the broadcast table its plan captured; restart the stream to
    pick up lifecycle changes (standard broadcast-join semantics).
    """

    _QDF_SCHEMA = ("query_id long, "
                   "qterms array<struct<term:string,qfreq:double,idf:double>>, "
                   "n_distinct int")

    def __init__(self, spark: SparkSession, queries: list[str],
                 stats: dict, opts: Bm25Options | None = None,
                 df_lookup=None):
        self.spark = spark
        self.opts = opts or Bm25Options()
        # slot list: query_id == position; remove_queries() tombstones a
        # slot to None so ids never renumber or get reused
        self.queries = list(queries)
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"]) or 1.0
        self._df = {t: int(v) for t, v in stats["df"].items()}
        # callable(terms) -> {term: df} resolving doc freqs for terms not
        # in the frozen dict (add_queries with unseen vocabulary); None =
        # unseen terms score with df 0
        self._df_lookup = df_lookup
        self._rebuild()

    def _rebuild(self) -> None:
        """(Re)derive the driver rows + the broadcastable K-row query
        table from the live slots and the frozen stats."""
        rows = []
        for qid, q in enumerate(self.queries):
            if q is None:
                continue
            qterms = tokenize_query(q, self.opts.text_config)
            rows.append((
                qid,
                [(t, float(qf),
                  idf_value(self.n_docs, int(self._df.get(t, 0))))
                 for t, qf in qterms],
                len({t for t, _ in qterms}),
            ))
        self._qrows = rows   # driver-side twin for match_doc()
        self._qdf = self.spark.createDataFrame(rows, self._QDF_SCHEMA)

    # -- standing-set lifecycle -----------------------------------------

    def add_queries(self, queries: list[str]) -> list[int]:
        """Register new standing queries against the SAME frozen corpus
        stats (n_docs/avgdl untouched — the reference-corpus snapshot is
        the percolator's contract). Doc freqs for terms the frozen dict
        has not seen resolve through the stats source (the index
        dictionary for :meth:`from_index`, a term-filtered corpus scan
        for :meth:`from_corpus`) — O(new terms), never a full refreeze.
        Returns the assigned query ids."""
        new_terms = sorted(
            {t for q in queries
             for t, _ in tokenize_query(q, self.opts.text_config)}
            - set(self._df))
        if new_terms and self._df_lookup is not None:
            self._df.update({t: int(v) for t, v
                             in self._df_lookup(new_terms).items()})
        ids = list(range(len(self.queries),
                         len(self.queries) + len(queries)))
        self.queries.extend(queries)
        self._rebuild()
        return ids

    def remove_queries(self, query_ids) -> int:
        """Unregister standing queries by id (slots tombstone in place —
        remaining ids are unchanged). Returns how many were removed."""
        n = 0
        for qid in query_ids:
            qid = int(qid)
            if 0 <= qid < len(self.queries) and self.queries[qid] is not None:
                self.queries[qid] = None
                n += 1
        if n:
            self._rebuild()
        return n

    # -- constructors --------------------------------------------------

    @classmethod
    def from_index(cls, index, queries: list[str]) -> "Percolator":
        """Freeze stats from a built :class:`Bm25Index` (its manifest
        already holds n_docs/avgdl; dfs come from the dictionary scan the
        same way a search attaches them)."""
        m = index.manifest

        def df_lookup(ts: list[str]) -> dict[str, int]:
            # add_queries' unseen terms resolve against the index
            # dictionary — one term-filtered scan, O(new terms)
            return {r["term"]: int(r["doc_freq"])
                    for r in index.term_stats(sorted(ts)).collect()}

        terms = sorted({t for q in queries
                        for t, _ in tokenize_query(q, m.opts.text_config)})
        return cls(index.spark, queries,
                   {"n_docs": m.total_docs, "avgdl": m.avgdl,
                    "df": df_lookup(terms)},
                   opts=m.opts, df_lookup=df_lookup)

    @classmethod
    def from_corpus(cls, spark: SparkSession, docs: DataFrame,
                    queries: list[str], text_col: str = "text",
                    id_col: str = "doc_id",
                    opts: Bm25Options | None = None) -> "Percolator":
        """Compute frozen stats from a reference corpus with the same
        convention as ``score_exhaustive`` (raw avgdl by default,
        ``opts.avgdl_mode='quantized'`` honored)."""
        opts = opts or Bm25Options()
        terms = sorted({t for q in queries
                        for t, _ in tokenize_query(q, opts.text_config)})
        postings = doc_postings(docs, text_col, id_col, opts)
        postings.persist()
        try:
            row = postings.agg(
                F.countDistinct("doc_id").alias("n"),
                F.sum("tf").alias("tl")).collect()[0]
            n_docs = int(row["n"] or 0)
            if opts.avgdl_mode == "quantized":
                dls = postings.groupBy("doc_id").agg(
                    F.first("doc_len").alias("dl"))
                qrow = dls.agg(F.sum(
                    quantize_len_col(F.col("dl"))).alias("ql")).collect()[0]
                avgdl = int(qrow["ql"] or 0) / max(n_docs, 1)
            else:
                avgdl = int(row["tl"] or 0) / max(n_docs, 1)
            df = {r["term"]: int(r["df"]) for r in
                  postings.filter(F.col("term").isin(terms))
                  .groupBy("term")
                  .agg(F.countDistinct("doc_id").alias("df")).collect()}
        finally:
            postings.unpersist(False)

        def df_lookup(ts: list[str]) -> dict[str, int]:
            # unseen-term dfs re-derive from the SAME reference corpus
            # (one term-filtered tokenize pass — the stats snapshot
            # semantics: df reflects the corpus as passed here, even if
            # the caller's docs have since changed on disk)
            return {r["term"]: int(r["df"]) for r in
                    doc_postings(docs, text_col, id_col, opts)
                    .filter(F.col("term").isin(sorted(ts)))
                    .groupBy("term")
                    .agg(F.countDistinct("doc_id").alias("df")).collect()}

        return cls(spark, queries,
                   {"n_docs": n_docs, "avgdl": avgdl, "df": df}, opts=opts,
                   df_lookup=df_lookup)

    # -- matching ------------------------------------------------------

    def matches(self, docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", min_score: float = 0.0,
                mode: str = "or", round_to: int = 4) -> DataFrame:
        """(query_id, doc_id, score) for every (standing query, document)
        pair the document matches, with rounded ``score >= min_score``.

        mode 'or': any standing-query term present; 'and': all of them.
        Works identically on a batch DataFrame and a streaming one (the
        plan is stateless — append output mode, no watermark required).
        Batch results are ordered (query_id, score DESC, doc_id).
        """
        if mode not in ("or", "and"):
            raise ValueError("percolate supports modes 'or' and 'and'")
        k1, b = float(self.opts.k1), float(self.opts.b)
        arrays = doc_term_arrays(docs, text_col, id_col, self.opts)
        pairs = (arrays
                 .withColumn("tfmap", F.map_from_arrays("terms", "tfs"))
                 .withColumn("qdl", quantize_len_col(F.col("doc_len"))
                             .cast("double"))
                 .join(F.broadcast(self._qdf)))
        matched = F.filter(
            F.col("qterms"), lambda q: F.map_contains_key(
                F.col("tfmap"), q["term"]))
        need = (F.lit(1) if mode == "or" else F.col("n_distinct")
                .cast("int"))
        # distinct matched terms == matched size (qterms dedups per term?
        # no — repeated query words share one term entry only in tf map;
        # tokenize_query emits (term, qfreq) with DISTINCT terms), so
        # size(matched) is the distinct-match count.
        score = F.aggregate(
            matched, F.lit(0.0),
            lambda acc, q: acc + q["qfreq"] * q["idf"]
            * (F.element_at(F.col("tfmap"), q["term"]).cast("double")
               * F.lit(k1 + 1.0))
            / (F.element_at(F.col("tfmap"), q["term"]).cast("double")
               + F.lit(k1) * (F.lit(1.0 - b)
                              + F.lit(b) * F.col("qdl") / F.lit(self.avgdl))))
        out = (pairs
               .withColumn("n_matched", F.size(matched))
               .filter(F.col("n_matched") >= need)
               .select("query_id", "doc_id",
                       F.round(score, round_to).alias("score"))
               .filter(F.col("score") >= float(min_score)))
        if not out.isStreaming:
            out = out.orderBy("query_id", F.desc("score"), F.asc("doc_id"))
        return out

    def match_doc(self, text: str, min_score: float = 0.0,
                  mode: str = "or",
                  round_to: int = 4) -> list[tuple[int, float]]:
        """Route ONE document to the K standing queries driver-side — the
        percolation serving shape (alert/routing rules on a single
        incoming item): no Spark job, same tokenizer and scoring as
        :meth:`matches` (same fold order over each query's terms, pinned
        score-identical in tests). Returns [(query_id, score)] ordered
        (score DESC, query_id ASC) with rounded score >= ``min_score``."""
        if mode not in ("or", "and"):
            raise ValueError("percolate supports modes 'or' and 'and'")
        from ..functions.fieldnorm import quantize_len
        from ..functions.tokenizer import tokenize
        k1, b = float(self.opts.k1), float(self.opts.b)
        terms, tfs, doc_len = tokenize(text, self.opts.text_config)
        tfmap = dict(zip(terms, tfs))
        qdl = float(quantize_len(doc_len))
        denom_fix = k1 * (1.0 - b + b * qdl / self.avgdl)
        out = []
        for qid, qterms, n_distinct in self._qrows:
            matched = [(t, qf, idf) for t, qf, idf in qterms if t in tfmap]
            if len(matched) < (1 if mode == "or" else n_distinct):
                continue
            s = 0.0
            for t, qf, idf in matched:
                tf = float(tfmap[t])
                s += qf * idf * (tf * (k1 + 1.0)) / (tf + denom_fix)
            s = round(s, round_to)
            if s >= float(min_score):
                out.append((int(qid), s))
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    def matches_inverted(self, docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", min_score: float = 0.0,
                         mode: str = "or", round_to: int = 4) -> DataFrame:
        """Same contract as :meth:`matches`, via an INVERTED QUERY INDEX —
        the scale path for large K (SCALE.md documents the flip point).

        :meth:`matches` is zero-shuffle but does O(docs x K) term-map
        probes: every document pays a lookup against every standing
        query. Here the standing queries are flattened to a term-level
        table (term -> query_id, qfreq, idf; one row per distinct query
        term, broadcast), each document's matching terms join against it,
        and a (query_id, doc_id) aggregate sums the BM25 contributions —
        so compute is O(matching postings) and documents matching nothing
        never reach the aggregate. Cost: ONE shuffle of the matched pairs
        (narrow rows, selective queries shrink it). Prefer this when
        K x docs dwarfs the expected match count (alert fleets with
        thousands of standing rules); prefer :meth:`matches` for
        human-scale K where zero-shuffle wins. Batch-only (the aggregate
        needs a shuffle; the streaming form would need watermark state —
        use :meth:`matches` in streams).
        """
        if mode not in ("or", "and"):
            raise ValueError("percolate supports modes 'or' and 'and'")
        if docs.isStreaming:
            raise ValueError("matches_inverted is batch-only; use "
                             "matches() for streaming percolation")
        k1, b = float(self.opts.k1), float(self.opts.b)
        tdf = self._qdf.select(
            "query_id", "n_distinct",
            F.explode("qterms").alias("q")
        ).select("query_id", "n_distinct", "q.term", "q.qfreq", "q.idf")

        arrays = doc_term_arrays(docs, text_col, id_col, self.opts)
        exploded = (arrays
                    .withColumn("qdl", quantize_len_col(F.col("doc_len"))
                                .cast("double"))
                    .select("doc_id", "qdl",
                            F.explode(F.arrays_zip(
                                F.col("terms").alias("term"),
                                F.col("tfs").alias("tf"))).alias("p"))
                    .select("doc_id", "qdl", "p.term",
                            F.col("p.tf").cast("double").alias("tf")))
        joined = exploded.join(F.broadcast(tdf), "term")
        contrib = (F.col("qfreq") * F.col("idf")
                   * (F.col("tf") * F.lit(k1 + 1.0))
                   / (F.col("tf") + F.lit(k1)
                      * (F.lit(1.0 - b)
                         + F.lit(b) * F.col("qdl") / F.lit(self.avgdl))))
        per_pair = (joined
                    .groupBy("query_id", "doc_id")
                    .agg(F.sum(contrib).alias("raw"),
                         F.count("*").alias("n_matched"),
                         F.first("n_distinct").alias("nd")))
        need = F.lit(1) if mode == "or" else F.col("nd").cast("int")
        return (per_pair
                .filter(F.col("n_matched") >= need)
                .select("query_id", "doc_id",
                        F.round(F.col("raw"), round_to).alias("score"))
                .filter(F.col("score") >= float(min_score))
                .orderBy("query_id", F.desc("score"), F.asc("doc_id")))


def percolate_oracle_sql(queries: list[str], threshold: float = 0.0,
                         table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text", mode: str = "or",
                         opts: Bm25Options | None = None,
                         ids: list[int] | None = None) -> str:
    """DuckDB twin for a percolator whose stats are frozen FROM ``table``
    itself: per-query full BM25 scoring (same formula/stats convention as
    :func:`oracle.bm25_oracle_sql`) filtered to ``score >= threshold``.
    ``ids`` overrides the enumerate positions — the twin for a percolator
    whose standing set was mutated by add/remove (stable ids, tombstoned
    slots absent)."""
    from .. import oracle as bm25_oracle
    pairs = list(zip(ids, queries)) if ids is not None \
        else list(enumerate(queries))
    parts = []
    for i, q in pairs:
        inner = bm25_oracle.bm25_oracle_sql(
            q, table=table, id_col=id_col, text_col=text_col, k=None,
            mode=mode, opts=opts)
        parts.append(
            f"SELECT {int(i)}::BIGINT AS query_id, * FROM (\n{inner}\n) "
            f"WHERE score >= {threshold}")
    return ("\nUNION ALL\n".join(parts)
            + "\nORDER BY query_id, score DESC, doc_id")
