"""One measured build+query job for the two-cluster-size scaling criterion.

Submitted via ``spark-submit --master local[N] --py-files pgts.zip`` by
``tools/bench_scaling.py`` — the production launch path from the north rule
(multi-executor analogue: ``--master yarn/k8s --num-executors N``). Reads a
pre-materialized corpus (same input at every parallelism level), builds the
segment index with a FIXED segment count (layout independent of
parallelism), runs a fixed query batch, prints one JSON line.

Timing excludes SparkSession startup; build throughput is files/sec over
the cold build (tokenize → shuffle → pack → manifest commit).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--index-path", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--num-segments", type=int, default=64)
    ap.add_argument("--queries", type=int, default=30)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pg_textsearch_spark.config import Bm25Options
    from pg_textsearch_spark.index.build import Bm25Index
    from pg_textsearch_spark.sources.corpus import KEYWORDS
    from pg_textsearch_spark.sources.loader import with_doc_ids

    src = with_doc_ids(spark.read.parquet(args.corpus))
    n_rows = src.count()

    shutil.rmtree(args.index_path, ignore_errors=True)
    opts = Bm25Options(text_config="simple", store_positions=False)
    t0 = time.time()
    idx = Bm25Index.build(spark, src, "content", args.index_path,
                          id_col="doc_id", opts=opts,
                          num_segments=args.num_segments,
                          assume_full_id_range=True)  # ids are xxhash64
    build_sec = time.time() - t0

    checked = idx.verify_content(src, "content", "doc_id")

    qs = []
    for i in range(args.queries):
        a = KEYWORDS[i % len(KEYWORDS)]
        b = KEYWORDS[(i * 7 + 3) % len(KEYWORDS)]
        c = "ident_%d" % (i * 13 % 500)
        qs.append(a if i % 3 == 0 else (f"{a} {b}" if i % 3 == 1 else f"{a} {b} {c}"))
    from pg_textsearch_spark.index.query import search_batch
    idx.search(qs[0], k=10).collect()  # warm Arrow workers (untimed)
    # batch throughput: all queries in one job (the cluster-correct shape;
    # reference analogue: 691-query single-client batch, BASELINE.md).
    # First run warms the FileIndex + codegen; report the steady-state min.
    times = []
    for _ in range(2):
        t1 = time.time()
        n_hits = search_batch(idx, qs, k=10).count()
        times.append(time.time() - t1)
    query_sec = min(times)
    # single-query latency (scheduling-bound at local[] scale)
    t2 = time.time()
    for q in qs[:5]:
        idx.search(q, k=10).collect()
    single_sec = (time.time() - t2) / 5

    stats = idx.stats()
    print(json.dumps({
        "cpus": args.cpus,
        "rows": n_rows,
        "sha256_checked": checked,
        "build_sec": round(build_sec, 3),
        "build_files_per_sec": round(n_rows / build_sec, 2),
        "query_batch_sec": round(query_sec, 3),
        "qps": round(args.queries / query_sec, 2),
        "ms_per_query": round(1000 * query_sec / args.queries, 2),
        "single_query_ms": round(1000 * single_sec, 1),
        "batch_hits": int(n_hits),
        "segments": stats["num_segments"],
        "index_bytes": stats["bytes"],
        "total_len": stats["total_len"],
        "max_skew_factor": stats["max_skew_factor"],
    }))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
