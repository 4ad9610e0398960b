"""Deletions (reference operators M4-M6: VACUUM bulkdelete + alive bitset).

The reference flips bits in each segment's alive bitset in place and drops
dead postings at the next merge (src/access/vacuum.c:44-60,771-814,960-985;
src/segment/alive_bitset.c). Segments here are immutable Parquet, so the
Spark-native equivalent is a *tombstone sidecar*:

- ``index/deletes/*.parquet`` (one ``doc_id`` column) — appended atomically
  by :func:`delete_docs`; the analogue of flipped alive bits.
- Query kernels mask tombstoned ids per term after block decode (the
  reference checks the bitset per hit, src/scoring/bmw.c). Corpus stats
  (N, avgdl, doc_freq) intentionally keep dead docs until a merge — exactly
  the reference's semantics (num_docs stays, alive_count shrinks).
- Merges anti-join decoded postings against the tombstones, so dead docs
  are physically dropped and the totals shrink (reference
  src/segment/merge.c:839-866 dead-doc correction).
- :func:`vacuum` = force-merge-all + docmap rewrite + tombstone clear
  (M5/M6 page reclamation).

Scale note: tombstones stay distributed (a DataFrame anti-join) on the
merge path; the query path broadcasts only the ids overlapping each
segment's doc-id range (sorted array + ``searchsorted`` slicing), which is
the Spark analogue of the reference's per-segment bitset locality.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETES_DIR = "deletes"


def _deletes_path(index) -> str:
    return os.path.join(index.path, DELETES_DIR)


def delete_docs(index, doc_ids) -> int:
    """Tombstone documents by id. ``doc_ids``: iterable of ints or a
    DataFrame with a ``doc_id`` column. Returns the number recorded."""
    path = _deletes_path(index)
    if isinstance(doc_ids, DataFrame):
        df = doc_ids.select(F.col("doc_id").cast("long"))
        df.write.mode("append").parquet(path)
        return df.count()
    ids = [int(i) for i in doc_ids]
    if not ids:
        return 0
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    t = pa.table({"doc_id": pa.array(sorted(set(ids)), pa.int64())})
    f = os.path.join(path, f"tomb-{uuid.uuid4().hex[:12]}.parquet")
    pq.write_table(t, f + ".tmp")
    os.replace(f + ".tmp", f)
    return len(set(ids))


def load_deletes(index) -> np.ndarray:
    """All tombstoned ids as a sorted unique int64 array (driver-side;
    per-query the kernel slices this to each segment's doc range)."""
    path = _deletes_path(index)
    if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)):
        return np.empty(0, dtype=np.int64)
    import pyarrow.dataset as ds
    arr = ds.dataset(path).to_table(columns=["doc_id"])["doc_id"].to_numpy()
    return np.unique(arr.astype(np.int64))


def deletes_df(index) -> DataFrame | None:
    path = _deletes_path(index)
    if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)):
        return None
    return index.spark.read.parquet(path).select(
        F.col("doc_id").cast("long")).distinct()


def clear_deletes(index) -> None:
    shutil.rmtree(_deletes_path(index), ignore_errors=True)


def vacuum(index) -> dict:
    """Physically drop tombstoned docs: force-merge all segments with
    dead-doc filtering, rewrite the global docmap, clear tombstones."""
    from .merge import force_merge_all, merge_segments

    tombs = load_deletes(index)
    before = index.manifest.total_docs
    if index.manifest.segments:
        # the merge drops dead rows from postings AND the per-segment
        # docmaps in one pass; a single segment still needs a rewrite run
        if len(index.manifest.segments) > 1:
            force_merge_all(index)
        else:
            seg = index.manifest.segments[0]
            merge_segments(index, [seg], out_level=seg.level)
    clear_deletes(index)
    return {"docs_before": before, "docs_after": index.manifest.total_docs,
            "tombstones_cleared": int(tombs.size)}
