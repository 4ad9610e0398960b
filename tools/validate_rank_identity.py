"""Rank-identity validation on a natural-English corpus at scale.

The reference validates its index against a ground-truth harness of
hundreds of real queries with per-rank score agreement at 1e-3
(benchmarks/datasets/msmarco/validate_queries.sql:8-28, summary.md:28-35).
This is the engine's analogue, self-contained (no external data):

1. Synthesize a deterministic ~natural-English corpus (Zipf vocabulary
   with inflected forms + function words, lognormal doc lengths).
2. Build the english-config (Snowball) segment index.
3. Score N queries (1-4 tokens, mixed frequency ranks) through the
   Block-Max engine (``search_batch``).
4. Independently re-score in DuckDB from the engine-tokenized postings
   (shared tokenizer, independent BM25 arithmetic — the reference's
   validate_bm25_scoring shares to_tsvector the same way).
5. Require identical (doc_id) per rank and |score delta| <= 1e-3.
6. Report latency buckets by query token count + BMW prune counters.

Usage: python tools/validate_rank_identity.py [n_docs] [n_queries_per_len]
Writes VALIDATION.md at the repo root.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ------------------------------------------------------ corpus generator

STEMS = """
search index query term document score rank merge segment block post list
compress encode decode skip batch stream build train model data point
cluster vector space match filter join group sort hash scan read write
store cache memory disk page file table column row value key range
partition shuffle broadcast execute plan optimize prune push spill flush
compact level tier manifest commit append delete insert update create
network node worker driver task stage job thread core system process
result answer question problem solution method approach technique way
language word sentence text corpus token stem stop phrase position
frequency weight measure metric quality signal noise error loss gain
machine learn deep neural layer feature label sample test valid
large small fast slow high low new old good great strong weak long short
important different similar common rare frequent recent early late
run walk move turn start stop end begin finish continue change grow
find lose keep hold bring take give send receive open close show hide
think know understand remember forget believe consider expect decide
""".split()

SUFFIXES = ["", "s", "ed", "ing", "er", "ly", "ation", "ness"]

FUNCTION_WORDS = ("the of and a to in is was for on that with as it by "
                  "at this be are from or an have not but had his they "
                  "you which one were her she there all we when your can "
                  "said who them been has will more no if out so what up "
                  "its about into than then now only").split()


def build_vocab() -> list[str]:
    vocab = []
    for i, stem_w in enumerate(STEMS):
        for j, suf in enumerate(SUFFIXES):
            if (i * 7 + j * 13) % 3 == 0 or suf == "":
                vocab.append(stem_w + suf)
    return vocab


def gen_corpus(spark, n_docs: int):
    """Deterministic corpus DataFrame (doc_id, text); text is per-doc_id
    reproducible regardless of partitioning."""
    from pyspark.sql import functions as F, types as T
    vocab = build_vocab()
    nv = len(vocab)
    zipf_w = 1.0 / np.arange(1, nv + 1) ** 1.1
    zipf_p = zipf_w / zipf_w.sum()
    nf = len(FUNCTION_WORDS)

    def run(batches):
        for pdf in batches:
            texts = []
            for did in pdf["id"]:
                rng = np.random.default_rng(0xC0FFEE ^ int(did))
                length = int(np.clip(rng.lognormal(4.0, 0.7), 20, 400))
                is_func = rng.random(length) < 0.35
                content = rng.choice(nv, size=length, p=zipf_p)
                funcs = rng.integers(0, nf, size=length)
                words = [FUNCTION_WORDS[funcs[i]] if is_func[i]
                         else vocab[content[i]] for i in range(length)]
                # burstiness: each doc is ABOUT 2 topic words that repeat
                # 5-40x (real text is bursty; iid sampling is not). This
                # gives per-block tf maxima the variance Block-Max skips
                # feed on: most 128-doc blocks have only background tf for
                # a given term, a few contain a topic doc.
                for t in rng.choice(nv, size=2, p=zipf_p):
                    reps = int(rng.integers(5, 40))
                    ins = rng.integers(0, len(words), size=reps)
                    tw = vocab[int(t)]
                    for p in ins:
                        words.insert(int(p), tw)
                # 'trending': topic-drift term decaying with doc_id
                trend_p = max(0.0, 0.9 - 3.0 * did / n_docs)
                n_trend = rng.binomial(12, trend_p)
                if n_trend:
                    ins = rng.integers(0, len(words), size=n_trend)
                    for p in ins:
                        words.insert(int(p), "trending")
                # light punctuation/capitalization noise
                out = []
                for i, w in enumerate(words):
                    if i % 11 == 0:
                        w = w.capitalize()
                    out.append(w + ("." if i % 13 == 12 else ""))
                texts.append(" ".join(out))
            yield pd.DataFrame({"doc_id": pdf["id"].astype("int64"),
                                "text": texts})

    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    return (spark.range(n_docs).repartition(32)
            .mapInPandas(run, schema))


def gen_queries(n_per_len: int) -> list[str]:
    vocab = build_vocab()
    rng = np.random.default_rng(0xBEEF)
    queries = []
    for qlen in (1, 2, 3, 4):
        for _ in range(n_per_len):
            # mix head/mid/tail ranks so some queries hit mega-terms
            ranks = rng.integers(0, [40, 200, len(vocab)],
                                 size=3)[rng.integers(0, 3)]
            terms = [vocab[int(rng.integers(0, max(ranks, 1)))]
                     for _ in range(qlen)]
            queries.append(" ".join(terms))
    return queries


# ------------------------------------------------------------ validation

def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_per_len = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from pg_textsearch_spark.spark_utils import get_spark, doc_postings
    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.index.build import Bm25Index
    from pg_textsearch_spark.index.query import search_batch
    from pg_textsearch_spark.functions.tokenizer import tokenize_query
    from pg_textsearch_spark.oracle import _fieldnorm_values

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("rank-identity", cpus=cpus, shuffle_partitions=cpus)
    opts = Bm25Options(text_config="english")

    print(f"== generating corpus: {n_docs} docs", flush=True)
    t0 = time.time()
    corpus_path = "/tmp/pgts_validate_corpus"
    if not os.path.exists(corpus_path):
        gen_corpus(spark, n_docs).write.mode("overwrite").parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    t_gen = time.time() - t0

    print("== building english-config index", flush=True)
    idx_path = "/tmp/pgts_validate_idx"
    if os.path.exists(idx_path):
        shutil.rmtree(idx_path)
    t0 = time.time()
    idx = Bm25Index.build(spark, docs, "text", idx_path, id_col="doc_id",
                          opts=opts, num_segments=16)
    t_build = time.time() - t0
    stats = idx.stats()
    print(f"   build {t_build:.1f}s; {stats}", flush=True)

    print("== exporting engine-tokenized postings for the oracle", flush=True)
    post_path = "/tmp/pgts_validate_postings"
    t0 = time.time()
    doc_postings(docs, "text", "doc_id", opts) \
        .select("doc_id", "term", "tf") \
        .write.mode("overwrite").parquet(post_path)
    t_export = time.time() - t0

    queries = gen_queries(n_per_len)
    qtok = {i: tokenize_query(q, "english") for i, q in enumerate(queries)}
    nonempty = {i: q for i, q in enumerate(queries) if qtok[i]}

    print(f"== engine: search_batch over {len(nonempty)} queries", flush=True)
    t0 = time.time()
    got = search_batch(idx, [nonempty[i] for i in sorted(nonempty)],
                       k=10).toPandas()
    t_batch_all = time.time() - t0
    qid_remap = {pos: i for pos, i in enumerate(sorted(nonempty))}
    got["query_id"] = got["query_id"].map(qid_remap)

    print("== oracle: independent DuckDB scoring", flush=True)
    k1, b = float(opts.k1), float(opts.b)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE tf AS SELECT * FROM read_parquet('{post_path}/*.parquet')")
    con.execute(f"""CREATE TABLE dl AS
        SELECT doc_id, SUM(tf) AS dl,
               (SELECT MAX(v) FROM (VALUES {_fieldnorm_values(1_000_000)})
                AS fnorm(v) WHERE v <= SUM(tf)) AS qdl
        FROM tf GROUP BY doc_id""")
    qrows = [(i, t, float(qf)) for i, terms in qtok.items()
             for t, qf in terms]
    con.execute("CREATE TABLE qmap(query_id INT, term TEXT, qfreq DOUBLE)")
    con.executemany("INSERT INTO qmap VALUES (?, ?, ?)", qrows)
    t0 = time.time()
    want = con.execute(f"""
WITH stats AS (
  SELECT {n_docs} AS n_docs,
         (SELECT SUM(tf) FROM tf) AS total_len
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf
  WHERE term IN (SELECT DISTINCT term FROM qmap) GROUP BY term
),
contrib AS (
  SELECT q.query_id, tf.doc_id,
         q.qfreq * ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         * (tf.tf * {k1 + 1.0})
         / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.qdl
              / (s.total_len * 1.0 / s.n_docs))) AS c
  FROM tf
  JOIN qmap q USING (term)
  JOIN dfreq d ON d.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, doc_id, ROUND(SUM(c), 4) AS score
  FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
)
SELECT query_id, rank, doc_id, score FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank
""").df()
    t_oracle = time.time() - t0

    # ------------------------------------------------ per-rank comparison
    mism = []
    for qid, grp in want.groupby("query_id"):
        eng = got[got["query_id"] == qid]
        if len(eng) != len(grp):
            mism.append((qid, "row_count", len(eng), len(grp)))
            continue
        wdocs = grp["doc_id"].to_numpy()
        edocs = eng["doc_id"].to_numpy()
        wsc = grp["score"].to_numpy()
        esc = eng["score"].to_numpy()
        if not (wdocs == edocs).all():
            mism.append((qid, "rank_order", wdocs.tolist(), edocs.tolist()))
        elif np.abs(wsc - esc).max() > 1e-3:
            mism.append((qid, "score", float(np.abs(wsc - esc).max()), None))

    n_q = len(nonempty)
    n_ok = n_q - len({m[0] for m in mism})
    print(f"== per-rank identity: {n_ok}/{n_q} queries OK", flush=True)
    for m in mism[:10]:
        print("   MISMATCH", m)

    # ------------------------------------------------ latency by q length
    buckets = {}
    for qlen in (1, 2, 3, 4):
        qs = [q for i, q in sorted(nonempty.items())
              if len(qtok[i]) == qlen or (qlen == 4 and len(qtok[i]) >= 4)]
        if not qs:
            continue
        search_batch(idx, qs[:5], k=10).count()        # warm
        t0 = time.time()
        search_batch(idx, qs, k=10).count()
        dt = time.time() - t0
        buckets[qlen] = (len(qs), dt, 1000.0 * dt / len(qs))

    # ------------------------------------------- serving read path parity
    print("== serve: LocalSearcher parity + latency", flush=True)
    srv = idx.serving()
    ordered_qs = [nonempty[i] for i in sorted(nonempty)]
    sgot = srv.search_batch(ordered_qs, k=10)
    sgot["query_id"] = sgot["query_id"].map(qid_remap)

    def _tuples(df):
        return list(zip(df["query_id"].astype(int),
                        df["doc_id"].astype(int),
                        df["score"].round(4)))

    serve_identical = _tuples(sgot) == _tuples(got)
    sq = ordered_qs[:60]
    for q in sq[:10]:
        srv.search(q, k=10)
    t0 = time.time()
    for q in sq:
        srv.search(q, k=10)
    serve_ms = 1000.0 * (time.time() - t0) / len(sq)
    t0 = time.time()
    srv.search_batch(ordered_qs, k=10)
    serve_batch_ms = 1000.0 * (time.time() - t0) / len(ordered_qs)
    print(f"   identical={serve_identical}  single {serve_ms:.1f} ms/q  "
          f"batch {serve_batch_ms:.2f} ms/q", flush=True)

    # ------------------------------------------------ BMW prune counters
    bmw = {}
    for name, q in (("hot_single", build_vocab()[0]),
                    ("mid_single", build_vocab()[60]),
                    ("hot_multi", " ".join(build_vocab()[:3])),
                    ("drift_single", "trending"),
                    ("drift_multi", "trending " + build_vocab()[0])):
        _, st = idx.search_profiled(q, k=10)
        bmw[name] = st

    # ------------------------------------------------ report
    lines = [
        "# VALIDATION — rank identity on natural-English corpus",
        "",
        f"- corpus: {n_docs} docs, deterministic Zipf English (tools/validate_rank_identity.py), gen {t_gen:.1f}s",
        f"- index: english config (Snowball), 16 segments, build {t_build:.1f}s",
        f"- index stats: {stats}",
        f"- oracle: DuckDB BM25 over engine-tokenized postings (export {t_export:.1f}s, scoring {t_oracle:.1f}s)",
        f"- queries: {n_q} (1-4 tokens, mixed head/mid/tail ranks)",
        "",
        f"## Result: {n_ok}/{n_q} queries with identical per-rank doc ids and |score delta| <= 1e-3",
        "",
        f"mismatches: {mism if mism else 'none'}",
        "",
        "## Latency by query token count (search_batch, warm, "
        f"local[{cpus}])",
        "",
        "| tokens | queries | total s | ms/query |",
        "|---|---|---|---|",
    ]
    for qlen, (nq, dt, ms) in sorted(buckets.items()):
        lines.append(f"| {qlen} | {nq} | {dt:.2f} | {ms:.1f} |")
    lines += [
        "",
        f"batch of all {n_q} queries in one job: {t_batch_all:.2f}s "
        f"({1000 * t_batch_all / n_q:.1f} ms/query)",
        "",
        "## Serving read path (index/serve.py, no Spark job)",
        "",
        f"- all {n_q} queries through LocalSearcher.search_batch: "
        f"result-identical to the Spark engine = **{serve_identical}**",
        f"- warm single-query: **{serve_ms:.1f} ms/query** "
        f"(reference single-client band: 5-178 ms, BASELINE.md)",
        f"- batched: **{serve_batch_ms:.2f} ms/query** "
        f"(reference single-client batch: 62.9 ms/query)",
        "",
        "## Block-Max pruning (blocks decoded / total, k=10)",
        "",
    ]
    for name, st in bmw.items():
        lines.append(f"- {name}: {st}")
    lines += ["", """## Analysis: when block-max pruning fires

Single-term counters are near-flat on this corpus and that is intrinsic,
not a kernel defect: with k1=1.2 the BM25 tf term saturates (tf 27 vs 39
differs ~1%), so a block's bound is governed by its shortest document —
and with hash/iid doc-id assignment every 128-doc block contains a
near-globally-short doc, making all bounds ~equal to the kth score
(measured: mid-rank term bounds 2.04-2.16 vs kth 2.12; 1/9 blocks
prunable). Pruning fires exactly where bound variance exists:
tf-skewed-by-doc-id corpora (tests/test_round2_features.py::
test_single_term_block_max_early_termination asserts decoded <
total/2), and the multi-term MaxScore non-essential phase
(drift_multi above skips ~20% via candidate-block random access).
The reference's BMW shows the same data dependence; doc-id reordering
(length- or content-correlated assignment) is the standard layout fix
and is future work for auto-assigned ids."""]
    report = "\n".join(lines) + "\n"
    # preserve manually-appended sections (e.g. the Cranfield parity
    # section) across regeneration: everything from the first '## Round'
    # heading onward is carried over verbatim
    out_path = os.path.join(REPO, "VALIDATION.md")
    if os.path.exists(out_path):
        with open(out_path) as f:
            old = f.read()
        cut = old.find("\n## Round")
        if cut != -1:
            report += old[cut:]
    with open(out_path, "w") as f:
        f.write(report)
    print(report)
    return 0 if not mism else 1


if __name__ == "__main__":
    sys.exit(main())
