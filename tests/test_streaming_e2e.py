"""Structured Streaming ingestion end-to-end (reference B11-B13).

Runs a real ``readStream -> writeStream.foreachBatch(stream_writer(...))``
query over a file source (deterministic: trigger(availableNow) drains the
pre-written files), then verifies:

- the streamed index returns EXACTLY the scores of a one-shot bulk build
  over the same corpus (global N/avgdl/df semantics across segments),
- a batch-id replay (the retry path a streaming checkpoint recovery
  produces) appends NOTHING (idempotency via manifest lineage).
"""

import os

import pytest

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.streaming.append import append_batch, stream_writer

SIMPLE = Bm25Options(text_config="simple")


def corpus_rows(lo, hi):
    return [(i, f"alpha w{i % 7} beta" if i % 3 == 0
             else f"w{i % 11} gamma delta w{i % 5}")
            for i in range(lo, hi)]


def test_stream_writer_end_to_end(spark, tmp_path):
    src_dir = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)
    schema = "id long, content string"

    # seed index (builds cannot start empty)
    seed = spark.createDataFrame(corpus_rows(0, 50), schema)
    idx = Bm25Index.build(spark, seed, "content", str(tmp_path / "idx"),
                          id_col="id", opts=SIMPLE, num_segments=1)

    # two pre-written source files = the stream's backlog
    spark.createDataFrame(corpus_rows(50, 200), schema) \
        .coalesce(1).write.parquet(src_dir + "/f1")
    spark.createDataFrame(corpus_rows(200, 350), schema) \
        .coalesce(1).write.parquet(src_dir + "/f2")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir + "/*"))
    q = (stream.writeStream
         .foreachBatch(stream_writer(idx, "content", "id"))
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(180)
    assert not q.isActive

    # streamed index == bulk build over the union corpus, score-for-score
    idx2 = Bm25Index(spark, idx.path)          # re-read committed manifest
    assert idx2.manifest.total_docs == 350
    bulk = Bm25Index.build(
        spark, spark.createDataFrame(corpus_rows(0, 350), schema),
        "content", str(tmp_path / "bulk"), id_col="id", opts=SIMPLE,
        num_segments=2)
    for query in ("alpha", "alpha beta", "gamma w3"):
        got = [(r["doc_id"], r["score"])
               for r in idx2.search(query, k=15).collect()]
        want = [(r["doc_id"], r["score"])
                for r in bulk.search(query, k=15).collect()]
        assert got == want, query

    # retry replay: re-appending an already-committed streaming batch_id is
    # a no-op (checkpoint recovery re-delivers the last batch after a crash)
    replay_id = max(s.lineage.get("batch_id") or 0
                    for s in idx2.manifest.segments
                    if s.lineage.get("kind") == "append")
    n_before = len(idx2.manifest.segments)
    recs = append_batch(idx2,
                        spark.createDataFrame(corpus_rows(200, 350), schema),
                        "content", "id", batch_id=replay_id)
    assert recs == []
    assert len(idx2.manifest.segments) == n_before
    assert idx2.manifest.total_docs == 350

    # ...and the no-op must SURVIVE compaction: batch ids ride merge
    # lineage, so a replay after the L0 segments were merged away is
    # still rejected (else checkpoint recovery double-ingests)
    idx2.force_merge()
    assert len(idx2.manifest.segments) == 1
    recs = append_batch(idx2,
                        spark.createDataFrame(corpus_rows(200, 350), schema),
                        "content", "id", batch_id=replay_id)
    assert recs == []
    assert idx2.manifest.total_docs == 350
