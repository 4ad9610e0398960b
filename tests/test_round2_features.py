"""Round-2 feature tests: block-max pruning + BMW counters, distributed
tombstones, default_limit, colon query constructor, flush alias, duplicate
-id detection, manifest format versioning."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index, search_tpquery
from pg_textsearch_spark.index.delete import deletes_by_segment
from pg_textsearch_spark.index.manifest import Manifest
from pg_textsearch_spark.operators.exhaustive import score_exhaustive

SIMPLE = Bm25Options(text_config="simple")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture()
def tmp_index(tmp_path):
    return str(tmp_path / "idx")


@pytest.fixture(scope="module")
def skewed(spark):
    """1500 docs, constant length 40, tf('alpha') high only for low ids —
    later posting blocks have strictly lower block-max bounds, so a
    single-term top-10 must be able to stop after the first blocks."""
    def text(i):
        t = 30 if i <= 60 else 1 + (i * i) % 7
        return " ".join(["alpha"] * t + ["pad"] * (40 - t))
    return spark.createDataFrame([(i, text(i)) for i in range(1, 1501)],
                                 "id long, content string")


@pytest.fixture(scope="module")
def mixed(spark):
    """Adversarial multi-term corpus: pseudo-random tfs per term."""
    def text(i):
        parts = (["alpha"] * (1 + (i * 7) % 11)
                 + ["beta"] * ((i * 3) % 5)
                 + ["gamma"] * ((i * i) % 3)
                 + ["filler"] * (i % 4))
        return " ".join(parts)
    return spark.createDataFrame([(i, text(i)) for i in range(1, 1201)],
                                 "id long, content string")


def test_single_term_block_max_early_termination(spark, skewed, tmp_index):
    idx = Bm25Index.build(spark, skewed, "content", tmp_index, id_col="id",
                          opts=SIMPLE, num_segments=1)
    top, stats = idx.search_profiled("alpha", k=10)
    assert stats["blocks_total"] >= 12          # 1500 postings / 128
    assert stats["blocks_decoded"] < stats["blocks_total"] // 2
    want = rows(score_exhaustive(spark, skewed, "content", "id", "alpha",
                                 SIMPLE, k=10))
    assert list(map(tuple, top.itertuples(index=False))) == want


def test_pruned_results_match_exhaustive(spark, mixed, tmp_index):
    idx = Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                          opts=SIMPLE, num_segments=3)
    for q in ["alpha", "beta", "gamma", "alpha beta", "beta gamma",
              "alpha beta gamma", "alpha filler", "alpha beta gamma filler"]:
        got = rows(idx.search(q, k=10))
        want = rows(score_exhaustive(spark, mixed, "content", "id", q,
                                     SIMPLE, k=10))
        assert got == want, q


def test_profiled_matches_search(spark, mixed, tmp_index):
    idx = Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                          opts=SIMPLE, num_segments=2)
    top, stats = idx.search_profiled("alpha beta gamma", k=15)
    want = rows(idx.search("alpha beta gamma", k=15))
    assert list(map(tuple, top.itertuples(index=False))) == want
    assert stats["blocks_total"] > 0
    assert 0 < stats["blocks_decoded"] <= stats["blocks_total"]
    assert idx.last_bmw_stats == stats


def test_default_limit_applied(spark, mixed, tmp_index):
    opts = Bm25Options(text_config="simple", default_limit=7)
    idx = Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                          opts=opts, num_segments=2)
    capped = idx.search("alpha", k=None).collect()
    assert len(capped) == 7        # default_limit caps the no-k call
    full = idx.search("alpha", k="all").collect()
    assert len(full) == 1200       # explicit escape returns everything
    assert [(r["doc_id"], r["score"]) for r in capped] == \
        [(r["doc_id"], r["score"]) for r in full[:7]]


def test_tombstones_sliced_per_segment(spark, mixed, tmp_index):
    idx = Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                          opts=SIMPLE, num_segments=3)
    # ids inside segment ranges + ids far outside every range
    idx.delete([5, 6, 10**15, -10**15])
    by_seg = deletes_by_segment(idx)
    shipped = {int(i) for arr in by_seg.values() for i in arr}
    assert shipped == {5, 6}       # out-of-range ids never ship
    got = {d for d, _ in rows(idx.search("alpha", k="all"))}
    assert 5 not in got and 6 not in got
    alive = mixed.filter(~F.col("id").isin([5, 6]))
    want = {d for d, _ in rows(score_exhaustive(
        spark, alive, "content", "id", "alpha", SIMPLE, k=None))}
    # stats stay dead-inclusive pre-vacuum so scores differ; doc SETS match
    assert got == want


def test_colon_query_constructor(spark, mixed, tmp_index):
    idx = Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                          opts=SIMPLE, num_segments=2)
    name = os.path.basename(tmp_index)   # auto-registered basename
    got = rows(search_tpquery(f"{name}:alpha beta", k=5))
    assert got == rows(idx.search("alpha beta", k=5))
    # no prefix + default_index
    assert rows(search_tpquery("alpha beta", default_index=idx, k=5)) == got
    with pytest.raises(KeyError):
        search_tpquery("nosuchindex:alpha")
    with pytest.raises(ValueError):
        search_tpquery("alpha beta")


def test_flush_alias_compacts(spark, mixed, tmp_index):
    opts = Bm25Options(text_config="simple", segments_per_level=2)
    idx = Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                          opts=opts, num_segments=4)
    before = rows(idx.search("alpha", k=10))
    assert idx.flush() >= 1
    assert rows(idx.search("alpha", k=10)) == before


def test_duplicate_doc_ids_fail_loudly(spark, tmp_index):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f"), (1, "a b c again")],
        "id long, content string")
    with pytest.raises(Exception, match="duplicate doc_id"):
        Bm25Index.build(spark, df, "content", tmp_index, id_col="id",
                        opts=SIMPLE, num_segments=1)


def test_manifest_rejects_old_format(spark, mixed, tmp_index):
    Bm25Index.build(spark, mixed, "content", tmp_index, id_col="id",
                    opts=SIMPLE, num_segments=1)
    p = os.path.join(tmp_index, "manifest.json")
    with open(p) as f:
        d = json.load(f)
    d["format_version"] = 1
    with open(p, "w") as f:
        json.dump(d, f)
    with pytest.raises(ValueError, match="format_version 1"):
        Manifest.load(tmp_index)


def test_uncompressed_segments_match(spark, mixed, tmp_path):
    """compress_segments=False (reference compress_segments GUC /
    test/sql/compression.sql): raw fixed-width posting streams, same
    block/skip layout, identical results through search + append + merge."""
    comp = Bm25Index.build(spark, mixed, "content", str(tmp_path / "c"),
                           id_col="id", opts=SIMPLE, num_segments=2)
    raw_opts = Bm25Options(text_config="simple", compress_segments=False)
    raw = Bm25Index.build(spark, mixed, "content", str(tmp_path / "r"),
                          id_col="id", opts=raw_opts, num_segments=2)
    for q in ["alpha", "alpha beta", "alpha beta gamma"]:
        assert rows(raw.search(q, k=10)) == rows(comp.search(q, k=10)), q
    assert raw.stats()["bytes"] > comp.stats()["bytes"]
    # merge path re-encodes with the index's own codec
    extra = spark.createDataFrame([(5001, "alpha beta zulu")],
                                  "id long, content string")
    raw.append(extra, "content", "id")
    raw.force_merge()
    comp.append(extra, "content", "id")
    comp.force_merge()
    assert rows(raw.search("alpha beta", k=10)) == \
        rows(comp.search("alpha beta", k=10))
