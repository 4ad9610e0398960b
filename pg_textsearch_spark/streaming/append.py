"""Incremental index maintenance — micro-batch appends (reference B11-B13).

The reference buffers INSERTs in an on-disk memtable and spills it as a new
L0 segment when thresholds trip (src/access/build.c:135-295). The Spark
equivalent: each micro-batch of new documents becomes one (or more) new L0
segment(s) plus an atomic manifest commit — usable directly or as the
``foreachBatch`` body of a Structured Streaming query
(``stream_writer`` below). Queries pick up appended segments on the next
manifest read; scores are identical to a bulk build because N/avgdl/df are
always computed globally across all live segments (SURVEY.md §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..spark_utils import doc_term_arrays
from ..index.manifest import SegmentRecord


def append_batch(index, docs: DataFrame, text_col: str, id_col: str,
                 auto_compact: bool = True,
                 batch_id: int | None = None) -> list[SegmentRecord]:
    """Append one batch of documents as a new L0 segment (B12 spill).

    ``batch_id`` makes streaming retries idempotent: a batch already
    recorded in the manifest is skipped."""
    from ..index.build import PACK_STATS_SCHEMA, make_packer

    manifest = index.manifest
    opts = manifest.opts
    if opts.reorder_docs != "none":
        raise ValueError(
            "append to a reorder_docs index is not supported: appended "
            "ids would break the dense length-ordered id space; rebuild "
            "or use reorder_docs='none' for incremental indexes")
    if batch_id is not None and any(
            s.lineage.get("batch_id") == batch_id
            or batch_id in (s.lineage.get("batch_ids") or ())
            for s in manifest.segments):
        return []
    src = docs.withColumn("__id", F.col(id_col).cast("long"))
    if src.isEmpty():
        return []

    seg_id = manifest.new_segment_id()
    seg_ids = {0: seg_id}
    from ..index.build import _rename_reserved_meta
    src, renamed = _rename_reserved_meta(src, docs.columns, id_col,
                                         text_col)
    meta_cols = [renamed.get(c, c) for c in docs.columns
                 if c not in ("__id", id_col, text_col)]
    postings = doc_term_arrays(src, text_col, "__id", opts,
                               extra_cols=meta_cols, with_sha=True)
    stats = (postings.withColumn("seg", F.lit(0))
             .groupBy("seg")
             .applyInPandas(make_packer(index.path, seg_ids, opts,
                                        ["content_sha256"] + meta_cols),
                            PACK_STATS_SCHEMA)
             .collect())

    recs = []
    for r in stats:
        rec = SegmentRecord(
            segment_id=r["segment_id"], level=0,
            num_docs=r["num_docs"], total_len=r["total_len"],
            total_qlen=r["total_qlen"],
            num_terms=r["num_terms"], num_postings=r["num_postings"],
            bytes=r["bytes"], min_doc_id=r["min_doc_id"],
            max_doc_id=r["max_doc_id"], max_doc_freq=r["max_doc_freq"],
            skew_factor=r["skew_factor"],
            term_min=r["term_min"] or "", term_max=r["term_max"] or "",
            lineage={"kind": "append", "batch_id": batch_id},
        )
        manifest.add_segment(rec)
        recs.append(rec)
    manifest.save()
    # (docmap rows ride inside the new segment's docs/ — no extra write)

    # auto-spill -> tiered compaction trigger (B13/M1 analogue)
    if auto_compact:
        from ..index.merge import compact_tiered
        compact_tiered(index)
    return recs


def stream_writer(index, text_col: str, id_col: str):
    """foreachBatch body for Structured Streaming ingestion:

        (stream_df.writeStream
            .foreachBatch(stream_writer(index, "content", "doc_id"))
            .option("checkpointLocation", ckpt)
            .start())

    Each micro-batch commits as an L0 segment; the streaming checkpoint
    provides exactly-once batch replay and the segment markers make the
    append idempotent within a batch retry.
    """
    def write(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(index, batch_df, text_col, id_col, batch_id=batch_id)
    return write
