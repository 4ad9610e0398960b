"""Source-table loader (reference operator B1, heap scan → document stream).

The production input is an Iceberg table of source-code repositories
(BASELINE.json input_hint). In this sandbox no Iceberg runtime jar is
shipped, so the loader resolves, in order:

1. an Iceberg/named catalog table (``spark.table`` / ``format("iceberg")``)
   when the runtime has the classes — gated behind a try so the same code
   path runs unchanged on a real cluster,
2. a Delta/parquet *path*.

Pre-filtering (partial-index analogue, reference README.md:220-245) is a
plain ``df.filter`` — Catalyst pushes it into the Iceberg/parquet scan, so
partition pruning and row-group skipping happen for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REQUIRED_COLS = ("repo", "path", "commit", "lang", "content")


def load_source_table(spark: SparkSession, ref: str,
                      predicate: str | None = None,
                      columns: list[str] | None = None) -> DataFrame:
    """Load the source-code table from an Iceberg table name or a path."""
    df = None
    if not os.path.exists(ref) and not ref.startswith(("file:", "hdfs:", "s3:")):
        # looks like a catalog table name
        try:
            df = spark.table(ref)
        except Exception:
            try:
                df = spark.read.format("iceberg").load(ref)
            except Exception:
                df = None
    if df is None:
        df = spark.read.parquet(ref)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    return df


def with_doc_ids(df: DataFrame,
                 key_cols: tuple[str, ...] = ("repo", "path", "commit")) -> DataFrame:
    """Stable 64-bit doc id from the natural key — deterministic across
    runs/cluster sizes (defines the BM25 tie order, SURVEY.md §1.1 B5)."""
    return df.withColumn("doc_id", F.xxhash64(*[F.col(c) for c in key_cols]))
