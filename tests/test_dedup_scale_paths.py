"""Scale-path dedup/ANN tests (round 2): hot-shingle capping, banded
simhash pair generation, sign-LSH blocked embedding dedup, Lloyd-trained
IVF. Each scale path is compared against its exact small-scale baseline —
subset/lower-bound guarantees are asserted exactly, recall is measured."""

import os

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.operators import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ------------------------------------------------- capped n-gram Jaccard

def test_capped_jaccard_is_lower_bound(spark):
    """With a hot boilerplate shingle shared by every doc, the capped run
    must (a) drop it from the join key, (b) never report a HIGHER jaccard
    than the exact run, and (c) keep genuinely-overlapping pairs."""
    boiler = "copyright acme corp"
    # docs 2i/2i+1 share a pair-private phrase (df=2, survives the cap);
    # the boilerplate prefix has df=20 and must be dropped
    rows = [(i, f"{boiler} unique{i} body{i} shared topic phrase{i // 2} end")
            for i in range(1, 21)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in dedup.ngram_jaccard_pairs(
                  df, threshold=0.0, max_shingle_df=5).collect()}
    assert capped, "shared alpha-beta-gamma shingles must survive the cap"
    assert set(capped) <= set(exact)
    for pair, j in capped.items():
        assert j <= exact[pair] + 1e-9


def test_capped_jaccard_noop_when_no_hot_shingles(spark, docs):
    small = docs.limit(120)
    exact = dedup.ngram_jaccard_pairs(small, threshold=0.2).collect()
    capped = dedup.ngram_jaccard_pairs(
        small, threshold=0.2, max_shingle_df=10**6).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, capped))


# ------------------------------------------------------- simhash pairs

def test_simhash_pairs_match_bruteforce(spark, docs):
    """Pigeonhole banding (4 bands, hamming <= 3) is EXACT, not
    approximate: the banded join must reproduce the full all-pairs set."""
    small = docs.limit(150)
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash(small).collect()}
    ids = sorted(sigs)
    want = {(a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3}
    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in dedup.simhash_pairs(small, max_hamming=3).collect()}
    assert got == want


def test_simhash_pairs_rejects_unsafe_hamming(spark, docs):
    with pytest.raises(ValueError):
        dedup.simhash_pairs(docs, max_hamming=dedup.SIMHASH_BANDS)


# ------------------------------------------- blocked embedding dedup

def test_embed_blocked_subset_and_recall(spark, embs):
    exact = {(r["vec_a"], r["vec_b"]): r["cos"]
             for r in dedup.embedding_dup_pairs(
                 embs, threshold=0.45).collect()}
    blocked = {(r["vec_a"], r["vec_b"]): r["cos"]
               for r in dedup.embedding_dup_pairs_blocked(
                   embs, threshold=0.45, n_bands=16, band_bits=4).collect()}
    # candidate generation can only lose pairs, never invent or rescore
    assert set(blocked) <= set(exact)
    for pair, c in blocked.items():
        assert c == exact[pair]
    if exact:
        recall = len(blocked) / len(exact)
        assert recall >= 0.8, f"sign-LSH recall {recall:.2f} below floor"


# --------------------------------------------------- IVF Lloyd training

def test_ivf_centroids_deterministic_and_complete(spark, embs):
    base = similarity._with_norm(embs, "embedding", "vec_id")
    dim = len(embs.select("embedding").first()[0])
    c1 = similarity.ivf_centroids(base, 8, 2, dim).collect()
    c2 = similarity.ivf_centroids(base, 8, 2, dim).collect()
    assert sorted(r["cent_id"] for r in c1) == sorted(
        r["cent_id"] for r in c2)
    assert len(c1) == 8
    m1 = {r["cent_id"]: r["cv"] for r in c1}
    m2 = {r["cent_id"]: r["cv"] for r in c2}
    assert m1 == m2                      # 6dp rounding => bit-stable


def test_ivf_lloyd_recall_vs_exact(spark, embs):
    qids = [0, 1, 2, 3, 4]
    exact = {(r["query_id"], r["vec_id"])
             for r in similarity.cosine_topk(embs, qids, k=5).collect()}
    dim = len(embs.select("embedding").first()[0])
    ivf = {(r["query_id"], r["vec_id"])
           for r in similarity.ivf_topk(
               embs, qids, k=5, n_centroids=8, nprobe=4, n_iters=2,
               dim=dim).collect()}
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"


# --------------------------------------------------- near-dup clustering

def test_dedup_clusters_chain_and_clique(spark):
    """A 4-node chain (worst diameter) + a 3-clique + singletons must all
    collapse to min-id components."""
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 11)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame(
        # chain 1-2-3-4; clique 5-6-7; 8,9,10 singletons
        [(1, 2, 0.9), (2, 3, 0.9), (3, 4, 0.9),
         (5, 6, 0.9), (5, 7, 0.9), (6, 7, 0.9)],
        "doc_a long, doc_b long, est_jaccard double")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 5,
                   8: 8, 9: 9, 10: 10}


def test_dedup_clusters_min_sim_filter(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in (1, 2, 3)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2, 0.9), (2, 3, 0.3)],
                                  "doc_a long, doc_b long, est_jaccard double")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.dedup_clusters(docs, pairs, min_sim=0.5).collect()}
    assert got == {1: 1, 2: 1, 3: 3}    # weak edge dropped


# ------------------------------------------------ persisted IVF artifact

def test_ivf_index_matches_adhoc_and_prunes(spark, embs, tmp_path):
    idx = similarity.IvfIndex.build(spark, embs, str(tmp_path / "ivf"),
                                    n_centroids=16, n_iters=2)
    got = idx.search_ids([0, 1, 2, 3, 4], k=5, nprobe=2)
    dim = len(embs.select("embedding").first()[0])
    want = similarity.ivf_topk(embs, [0, 1, 2, 3, 4], k=5, n_centroids=16,
                               nprobe=2, n_iters=2, dim=dim)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]
    # probe filter must reach the directory layout as a partition filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan


# ------------------------------------------------ chunk-level dup stats

def test_chunk_dup_stats(spark):
    from pg_textsearch_spark.operators import textstats
    boiler = " ".join(f"b{i}" for i in range(16))      # one full chunk
    uniq = lambda d: " ".join(f"u{d}_{i}" for i in range(16))  # noqa: E731
    docs = spark.createDataFrame(
        [(1, boiler + " " + uniq(1)),     # chunks: [boiler, uniq1]
         (2, boiler + " " + uniq(2)),     # boiler shared across docs
         (3, uniq(3) + " " + uniq(3)),    # self-repetition
         (4, "short tail only")],         # single partial chunk, unique
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_ratio_bp"])
           for r in textstats.chunk_dup_stats(docs).collect()}
    assert got[1] == (2, 1, 5000)
    assert got[2] == (2, 1, 5000)
    assert got[3] == (2, 2, 10000)        # within-doc repeat counts
    assert got[4] == (1, 0, 0)


# ------------------------------------------------ repetition stats (Gopher)

def test_repetition_stats_hand_corpus(spark):
    import duckdb
    from pg_textsearch_spark.operators import textstats
    docs = spark.createDataFrame(
        [(1, "alpha beta\nalpha beta\ngamma delta"),  # repeated line
         (2, "x y x y x y x y x y"),                  # heavy n-gram repeats
         (3, ""),                                     # empty doc
         (4, "single")],                              # no grams at all
        "doc_id long, text string")
    cols = ("n_lines", "dup_line_bp", "dup_line_char_bp",
            "top2gram_char_bp", "top3gram_char_bp", "dup5gram_bp")
    got = {r["doc_id"]: tuple(r[c] for c in cols)
           for r in textstats.repetition_stats(docs).collect()}
    # doc 1: 2/3 lines dup (6666 bp), 20/31 line chars (6451);
    # top 2-gram "alpha beta" x2 -> 2*9/28 word chars (6428); 3-grams all
    # unique, tie -> lex-smallest "alpha beta alpha" -> 14/28 (5000)
    assert got[1] == (3, 6666, 6451, 6428, 5000, 0)
    # doc 2: "x y" x5 -> 10/10 chars; "x y x" x4 -> 12/10 (overlap > 1);
    # all six 5-grams are occurrences of a repeated gram -> 10000
    assert got[2] == (1, 0, 0, 10000, 12000, 10000)
    assert got[3] == (0, 0, 0, 0, 0, 0)
    assert got[4] == (1, 0, 0, 0, 0, 0)

    # DuckDB twin agrees row-for-row on the same corpus
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    odf = con.sql(textstats.repetition_stats_oracle_sql()).df()
    for _, r in odf.iterrows():
        assert got[int(r["doc_id"])] == tuple(int(r[c]) for c in cols)


# ---------------------------------------------- benchmark decontamination

def test_decontaminate_hand_corpus(spark):
    import duckdb
    from pg_textsearch_spark.operators.decontaminate import (
        decontaminate, decontaminate_oracle_sql)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "a completely different document with no overlap at all here"),
         (3, "quick brown fox jumps over the lazy dog is a pangram piece"),
         (4, "short doc")],                      # < n words: never flagged
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "we ask whether the quick brown fox jumps over the lazy dog"),
         (101, "no overlap at all here either but short")],
        "eval_id long, text string")
    got = {r["doc_id"]: (r["hit_ngrams"], r["eval_hits"])
           for r in decontaminate(docs, ev, n=6).collect()}
    # doc 1 shares 4 distinct 6-grams with eval 100 (sliding through
    # "the quick brown fox jumps over the lazy dog"); doc 3 shares 3
    # (its text starts at "quick"); docs 2/4 are clean
    assert got == {1: (4, 1), 3: (3, 1)}

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    con.register("evals", ev.toPandas())
    odf = con.sql(decontaminate_oracle_sql(
        "SELECT eval_id, text FROM evals", n=6)).df()
    assert {int(r["doc_id"]): (int(r["hit_ngrams"]), int(r["eval_hits"]))
            for _, r in odf.iterrows()} == got

    # 100 TB shape: the eval side must reach the join as a broadcast
    plan = decontaminate(docs, ev, n=6)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --------------------------------------------------------- PII scrubbing

def test_pii_scrub_hand_corpus(spark):
    import duckdb
    from pg_textsearch_spark.operators.pii import (pii_scrub,
                                                   pii_scrub_oracle_sql)
    docs = spark.createDataFrame(
        [(1, "contact john.doe+spam@example.co.uk or call +1 415 555 0123"),
         (2, "server at 10.0.0.1 and 192.168.001.255, ssn 123-45-6789"),
         (3, "no pii here at all, just 42 and 3.14"),
         (4, "mail a@b.io b@c.org; phones 415-555-0123 and 020 7946 0958")],
        "doc_id long, text string")
    got = pii_scrub(docs).toPandas()
    by = {r.doc_id: r for r in got.itertuples()}
    assert (by[1].n_email, by[1].n_phone) == (1, 1)
    assert (by[2].n_ipv4, by[2].n_ssn) == (2, 1)
    assert (by[3].n_email, by[3].n_ssn, by[3].n_ipv4, by[3].n_phone) \
        == (0, 0, 0, 0)
    assert (by[4].n_email, by[4].n_phone) == (2, 2)

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    odf = con.sql(pii_scrub_oracle_sql()).df()
    import pandas as pd
    pd.testing.assert_frame_equal(got, odf)
