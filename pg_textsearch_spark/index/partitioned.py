"""Partitioned-corpus BM25 indexes with PARTITION-LOCAL statistics.

The reference documents (README.md:544-579) that BM25 indexes on
partitioned tables keep per-partition stats — each partition has its own
total_docs / avg_doc_len / per-term doc frequencies — so single-partition
queries score accurately against that partition and cross-partition
queries return per-partition scores that are NOT comparable across
partitions. This module is the engine's analogue: one child
:class:`~pg_textsearch_spark.index.build.Bm25Index` per partition value,
composed behind one API.

Contrast with the engine default: a single ``Bm25Index`` over the whole
corpus uses GLOBAL statistics (the semantics SURVEY.md §1.4 prefers — a
segment layout never changes scores). Use this class when the corpus is
naturally partitioned (time buckets, tenants, crawls) and queries target
one partition, or when partitions must be built/refreshed independently.

Scale notes (100 TB): each child build scans only its partition's rows —
with a partition-pruned source (parquet/iceberg partitioned by the same
column, Catalyst pushes ``partition_col = value`` to the scan) the builds
touch disjoint data and can run on whatever cadence the partition changes
(the daily bucket rebuilds; last year's never does). Cross-partition
search unions per-child plans; Spark runs the per-segment kernels of all
children in one job.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import Bm25Options
from .build import Bm25Index

__all__ = ["PartitionedBm25Index"]

_META = "partitions.json"


class PartitionedBm25Index:
    """One Bm25Index per partition value; partition-local stats.

    Reference parity: README.md:544-566 (partition-local total_docs,
    avg_doc_len and doc frequencies; per-partition score scales).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, _META)) as f:
            meta = json.load(f)
        self.partition_col: str = meta["partition_col"]
        self.partitions: list[str] = meta["partitions"]
        self._children: dict[str, Bm25Index] = {}

    # ------------------------------------------------------------- build

    @classmethod
    def build(cls, spark: SparkSession, df: DataFrame, text_col: str,
              path: str, partition_col: str, id_col: str = "doc_id",
              opts: Bm25Options | None = None,
              num_segments: int | None = None,
              partitions: list[str] | None = None) -> "PartitionedBm25Index":
        """Build one child index per distinct ``partition_col`` value.

        ``partitions``: optional explicit value list (skips the distinct
        scan, and allows building a subset — e.g. only today's bucket).
        Partition values are directory names; they must be non-null
        strings without '/'.
        """
        if partitions is None:
            partitions = sorted(
                r[0] for r in
                df.select(F.col(partition_col).cast("string"))
                .distinct().collect() if r[0] is not None)
        if not partitions:
            raise ValueError("no partition values")
        for v in partitions:
            if "/" in v or v in (".", ".."):
                raise ValueError(f"unsafe partition value: {v!r}")
        os.makedirs(path, exist_ok=True)
        for v in partitions:
            part_df = df.filter(F.col(partition_col).cast("string") == v)
            Bm25Index.build(
                spark, part_df, text_col,
                os.path.join(path, f"part={v}"), id_col=id_col,
                opts=opts, num_segments=num_segments)
        tmp = os.path.join(path, _META + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"partition_col": partition_col,
                       "partitions": partitions}, f)
        os.replace(tmp, os.path.join(path, _META))
        return cls(spark, path)

    def build_partition(self, df: DataFrame, text_col: str, value: str,
                        id_col: str = "doc_id",
                        opts: Bm25Options | None = None,
                        num_segments: int | None = None) -> None:
        """(Re)build ONE partition's child index — the refresh unit for
        time-partitioned corpora (reference 'time-partitioned data'
        recommendation, README.md:563-566)."""
        import shutil
        part_df = df.filter(
            F.col(self.partition_col).cast("string") == value)
        final = os.path.join(self.path, f"part={value}")
        tmp = final + f".rebuild-{os.getpid()}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        Bm25Index.build(self.spark, part_df, text_col, tmp,
                        id_col=id_col, opts=opts, num_segments=num_segments)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        self._children.pop(value, None)
        if value not in self.partitions:
            self.partitions.append(value)
            tmp = os.path.join(self.path, _META + ".tmp")
            with open(tmp, "w") as f:
                json.dump({"partition_col": self.partition_col,
                           "partitions": self.partitions}, f)
            os.replace(tmp, os.path.join(self.path, _META))

    # ------------------------------------------------------------ search

    def child(self, value: str) -> Bm25Index:
        if value not in self._children:
            self._children[value] = Bm25Index(
                self.spark, os.path.join(self.path, f"part={value}"))
        return self._children[value]

    def search(self, query: str, k: int | None | str = 10,
               partitions: list[str] | None = None,
               mode: str = "or") -> DataFrame:
        """Top-k per REQUESTED scope with partition-local scores.

        One partition: accurate BM25 within it (the reference's
        single-partition case). Several: per-partition scores unioned,
        then a global (score, doc_id) cut — faithful to the reference's
        cross-partition behavior where scores ride each partition's own
        scale (README.md:555-560); the result carries the partition column
        so callers can see which scale each row came from."""
        parts = self.partitions if partitions is None else partitions
        unknown = [p for p in parts if p not in self.partitions]
        if unknown:
            raise ValueError(f"unknown partitions: {unknown}")
        plans = []
        for v in parts:
            child = self.child(v)
            plans.append(child.search(query, k=k, mode=mode)
                         .withColumn(self.partition_col, F.lit(v)))
        out = plans[0]
        for p in plans[1:]:
            out = out.unionByName(p)
        if len(plans) > 1 and isinstance(k, int):
            out = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        return out

    def stats(self) -> dict:
        """Per-partition manifest stats — shows the partition-local
        total_docs/avgdl the reference describes."""
        return {v: {"total_docs": self.child(v).manifest.total_docs,
                    "avgdl": self.child(v).manifest.avgdl}
                for v in self.partitions}

    def serving(self, cache_terms: int = 4096) -> "PartitionedLocalSearcher":
        """Driver-local serving over every child index — the partitioned
        counterpart of Bm25Index.serving()."""
        return PartitionedLocalSearcher(self.path, self.partition_col,
                                        self.partitions,
                                        cache_terms=cache_terms)


class PartitionedLocalSearcher:
    """Point queries over a PartitionedBm25Index without a Spark job:
    one LocalSearcher per child (each with its own reader cache and
    partition-LOCAL stats — identical semantics to the Spark path's
    per-partition scoring), unioned with the same global
    (score DESC, doc_id ASC) cut."""

    def __init__(self, path: str, partition_col: str,
                 partitions: list[str], cache_terms: int = 4096):
        import os as _os
        from .serve import LocalSearcher
        self.partition_col = partition_col
        self.partitions = list(partitions)
        self._children = {
            v: LocalSearcher(_os.path.join(path, f"part={v}"),
                             cache_terms=cache_terms)
            for v in self.partitions}

    def search(self, query: str, k: int | None | str = 10,
               partitions: list[str] | None = None, mode: str = "or"):
        import pandas as pd
        parts = self.partitions if partitions is None else partitions
        unknown = [p for p in parts if p not in self._children]
        if unknown:
            raise ValueError(f"unknown partitions: {unknown}")
        frames = []
        for v in parts:
            out = self._children[v].search(query, k=k, mode=mode)
            out[self.partition_col] = v
            frames.append(out)
        pdf = pd.concat(frames, ignore_index=True)
        if len(parts) > 1 and isinstance(k, int):
            pdf = (pdf.sort_values(["score", "doc_id"],
                                   ascending=[False, True],
                                   kind="mergesort")
                   .head(k).reset_index(drop=True))
        return pdf
