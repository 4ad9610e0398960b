"""Structured Streaming ingestion (foreachBatch -> L0 segment appends,
reference B11-B13) and text-array flatten (reference B2)."""

import os

import pytest
from pyspark.sql import functions as F

from pg_textsearch_spark.config import Bm25Options
from pg_textsearch_spark.index.build import Bm25Index
from pg_textsearch_spark.streaming.append import stream_writer

ENG = Bm25Options(text_config="english")


def rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _corpus_rows(n):
    def text(i):
        parts = ["alpha"]
        if i % 2 == 0:
            parts.append("beta")
        if i % 5 == 0:
            parts.append("gamma")
        return " ".join(parts) + f" body {i}"
    return [(i, text(i)) for i in range(1, n + 1)]


def test_streaming_ingestion_matches_bulk(spark, tmp_path):
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    data = _corpus_rows(120)
    # seed index with the first 40 docs, stream the rest in two files
    seed = spark.createDataFrame(data[:40], "id long, content string")
    idx = Bm25Index.build(spark, seed, "content", str(tmp_path / "sidx"),
                          id_col="id", opts=ENG, num_segments=2)
    for j, lo in enumerate((40, 80)):
        (spark.createDataFrame(data[lo:lo + 40], "id long, content string")
         .coalesce(1).write.parquet(os.path.join(src_dir, f"batch{j}")))

    stream = (spark.readStream.schema("id long, content string")
              .option("recursiveFileLookup", "true").parquet(src_dir))
    q = (stream.writeStream
         .foreachBatch(stream_writer(idx, "content", "id"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)

    assert idx.manifest.total_docs == 120
    full = spark.createDataFrame(data, "id long, content string")
    bulk = Bm25Index.build(spark, full, "content", str(tmp_path / "bidx"),
                           id_col="id", opts=ENG, num_segments=3)
    for query in ["gamma", "alpha beta", "beta gamma"]:
        assert rows(idx.search(query, k=12)) == rows(bulk.search(query, k=12)), query


def test_text_array_flatten(spark, tmp_path):
    arr = spark.createDataFrame(
        [(1, ["hello world", None, "goodbye"]), (2, ["cruel world"]),
         (3, [])],
        "id long, parts array<string>")
    flat = spark.createDataFrame(
        [(1, "hello world goodbye"), (2, "cruel world"), (3, "")],
        "id long, content string")
    ia = Bm25Index.build(spark, arr, "parts", str(tmp_path / "ia"),
                         id_col="id", opts=ENG, num_segments=1)
    ib = Bm25Index.build(spark, flat, "content", str(tmp_path / "ib"),
                         id_col="id", opts=ENG, num_segments=1)
    for q in ["world", "goodbye cruel"]:
        assert rows(ia.search(q, k=5)) == rows(ib.search(q, k=5)), q
    assert ia.manifest.total_docs == 3
