"""Segment posting-list packing and decoding (pure numpy, Spark-free).

A segment is an immutable Parquet file with one row per (term, shard):
sorted term dictionary + 128-doc posting blocks (delta-gap varbyte doc_ids,
varbyte tfs, raw 1-byte fieldnorms) + per-block skip entries with block
maxima for block-max pruning. This mirrors the reference's segment layout
(dictionary: src/segment/format.h:149-203; postings/blocks:
src/segment/format.h:208-277 and src/segment/segment.c:1097-1246; skip
entries with block_max_tf / block_max_norm: src/segment/format.h:230-239)
re-expressed as a columnar Parquet schema so Catalyst gives dictionary
lookup (term predicate pushdown, Q10) for free.

Skew handling: a term whose posting list exceeds ``max_postings_per_row``
is split into multiple *shards* — consecutive doc_id ranges, one row each.
Shards make mega-terms (common source-code keywords) streamable and are the
deterministic re-merge counterpart of salted repartitioning at merge time.

Everything here is numpy-vectorized per term; the only Python loop is over
unique terms (dictionary-sized, not postings-sized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..config import BLOCK_SIZE
from .codec import (
    delta_decode_blocks,
    delta_encode_blocks,
    varbyte_decode,
    varbyte_encode,
)

MAX_POSTINGS_PER_ROW = 1 << 20

POSTINGS_COLUMNS = [
    "term", "shard", "min_doc_id", "last_doc_id", "doc_freq", "num_blocks",
    "doc_ids_bin", "tfs_bin", "norms_bin",
    "skip_last_doc_id", "skip_doc_count", "skip_max_tf", "skip_min_norm",
    "skip_doc_off", "skip_tf_off",
    "pos_counts_bin", "pos_deltas_bin",
]


def _varbyte_nbytes(values: np.ndarray) -> np.ndarray:
    vals = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    return np.maximum((nbits + 6) // 7, 1)


def pack_term(
    term: str,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    norms: np.ndarray,
    positions: list | None = None,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = MAX_POSTINGS_PER_ROW,
) -> list[dict]:
    """Pack one term's postings (sorted by doc_id) into 1+ shard rows."""
    n = doc_ids.size
    rows = []
    for shard_idx, start in enumerate(range(0, n, max_postings_per_row)):
        end = min(start + max_postings_per_row, n)
        ids = doc_ids[start:end]
        t = tfs[start:end]
        nm = norms[start:end]
        m = ids.size
        nblocks = (m + block_size - 1) // block_size
        deltas = delta_encode_blocks(ids, block_size)
        doc_bin = varbyte_encode(deltas.astype(np.uint64))
        tf_bin = varbyte_encode(t.astype(np.uint64))
        norm_bin = nm.astype(np.uint8).tobytes()

        ends = np.minimum(np.arange(1, nblocks + 1) * block_size, m) - 1
        block_starts = np.arange(0, m, block_size)
        skip_last = ids[ends]
        counts = np.diff(np.r_[0, ends + 1])
        max_tf = np.maximum.reduceat(t, block_starts)
        min_norm = np.minimum.reduceat(nm, block_starts)
        # per-block byte offsets into doc_ids_bin / tfs_bin: enable
        # random-access block decode (reference TpSkipEntry.posting_offset,
        # src/segment/format.h:230-239)
        dlen = np.cumsum(_varbyte_nbytes(deltas.astype(np.uint64)))
        tlen = np.cumsum(_varbyte_nbytes(t.astype(np.uint64)))
        doc_off = np.r_[0, dlen[:-1]][block_starts]
        tf_off = np.r_[0, tlen[:-1]][block_starts]

        row = {
            "term": term,
            "shard": shard_idx,
            "min_doc_id": int(ids[0]),
            "last_doc_id": int(ids[-1]),
            "doc_freq": int(m),
            "num_blocks": int(nblocks),
            "doc_ids_bin": doc_bin,
            "tfs_bin": tf_bin,
            "norms_bin": norm_bin,
            "skip_last_doc_id": skip_last.astype(np.int64).tolist(),
            "skip_doc_count": counts.astype(np.int32).tolist(),
            "skip_max_tf": max_tf.astype(np.int32).tolist(),
            "skip_min_norm": min_norm.astype(np.int32).tolist(),
            "skip_doc_off": doc_off.astype(np.int64).tolist(),
            "skip_tf_off": tf_off.astype(np.int64).tolist(),
            "pos_counts_bin": None,
            "pos_deltas_bin": None,
        }
        if positions is not None:
            plists = positions[start:end]
            pcounts = np.asarray([len(p) for p in plists], dtype=np.uint64)
            flat = [np.asarray(p, dtype=np.int64) for p in plists]
            if flat:
                cat = np.concatenate(flat)
                # delta within each posting's position list, first absolute
                d = cat.copy()
                offs = np.cumsum(pcounts)[:-1].astype(np.int64)
                d[1:] = cat[1:] - cat[:-1]
                starts_ = np.r_[0, offs]
                d[starts_] = cat[starts_]
                row["pos_counts_bin"] = varbyte_encode(pcounts)
                row["pos_deltas_bin"] = varbyte_encode(d.astype(np.uint64))
        rows.append(row)
    return rows


def pack_postings_frame(
    pdf: pd.DataFrame,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = MAX_POSTINGS_PER_ROW,
    with_positions: bool = False,
) -> pd.DataFrame:
    """Pack a (doc_id, term, tf, fieldnorm[, positions]) frame into shard rows.

    Input need not be sorted; NULL-term marker rows must already be removed.
    """
    if len(pdf) == 0:
        return pd.DataFrame({c: [] for c in POSTINGS_COLUMNS})
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    norms = pdf["fieldnorm"].to_numpy()[order].astype(np.int64)
    pos = pdf["positions"].to_numpy()[order] if with_positions else None

    uniq, starts = np.unique(terms, return_index=True)
    bounds = np.r_[starts, terms.size]
    out: list[dict] = []
    for i, term in enumerate(uniq):
        s, e = bounds[i], bounds[i + 1]
        plists = list(pos[s:e]) if pos is not None else None
        out.extend(pack_term(str(term), ids[s:e], tfs[s:e], norms[s:e],
                             plists, block_size, max_postings_per_row))
    return pd.DataFrame(out, columns=POSTINGS_COLUMNS)


def decode_row(row: dict | pd.Series, block_size: int = BLOCK_SIZE):
    """Decode one shard row -> (doc_ids, tfs, norms) int64 arrays."""
    n = int(row["doc_freq"])
    deltas = varbyte_decode(row["doc_ids_bin"], count=n).astype(np.int64)
    ids = delta_decode_blocks(deltas, block_size)
    tfs = varbyte_decode(row["tfs_bin"], count=n).astype(np.int64)
    norms = np.frombuffer(row["norms_bin"], dtype=np.uint8).astype(np.int64)
    return ids, tfs, norms


def decode_positions(row: dict | pd.Series):
    """Decode the positions sidecar -> list of int64 arrays per posting."""
    if row["pos_counts_bin"] is None:
        return None
    n = int(row["doc_freq"])
    counts = varbyte_decode(row["pos_counts_bin"], count=n).astype(np.int64)
    total = int(counts.sum())
    deltas = varbyte_decode(row["pos_deltas_bin"], count=total).astype(np.int64)
    # undo per-posting delta: cumsum then subtract carry-over at starts
    ends = np.cumsum(counts)
    starts = ends - counts
    g = np.cumsum(deltas)
    # group-local cumsum = global cumsum minus the prefix sum before each
    # group (the first delta of each group is stored absolute; every posting
    # has >= 1 position, so counts >= 1)
    prefix = np.r_[np.int64(0), g[ends[:-1] - 1]]
    out = g - np.repeat(prefix, counts)
    return [out[s:e] for s, e in zip(starts, ends)]
