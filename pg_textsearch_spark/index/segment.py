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
    stream_decode,
    stream_encode,
    stream_nbytes,
    varbyte_decode,
    varbyte_encode,
)

MAX_POSTINGS_PER_ROW = 1 << 20

POSTINGS_COLUMNS = [
    "term", "shard", "min_doc_id", "last_doc_id", "doc_freq", "num_blocks",
    "doc_ids_bin", "tfs_bin", "norms_bin",
    "skip_last_doc_id", "skip_doc_count", "skip_max_tf", "skip_min_norm",
    "skip_doc_off", "skip_tf_off",
    "pos_counts_bin", "pos_deltas_bin", "skip_pos_off",
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
    codec: str = "varbyte",
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
        block_starts = np.arange(0, m, block_size)
        deltas = delta_encode_blocks(ids, block_size)
        doc_bin = stream_encode(deltas.astype(np.uint64), codec, block_starts)
        tf_bin = stream_encode(t.astype(np.uint64), codec, block_starts)
        norm_bin = nm.astype(np.uint8).tobytes()

        ends = np.minimum(np.arange(1, nblocks + 1) * block_size, m) - 1
        skip_last = ids[ends]
        counts = np.diff(np.r_[0, ends + 1])
        max_tf = np.maximum.reduceat(t, block_starts)
        min_norm = np.minimum.reduceat(nm, block_starts)
        # per-block byte offsets into doc_ids_bin / tfs_bin: enable
        # random-access block decode (reference TpSkipEntry.posting_offset,
        # src/segment/format.h:230-239)
        dlen = np.cumsum(stream_nbytes(deltas.astype(np.uint64), codec,
                                       block_starts))
        tlen = np.cumsum(stream_nbytes(t.astype(np.uint64), codec,
                                       block_starts))
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
            "skip_pos_off": None,
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
                # per-block byte offsets into pos_deltas_bin (each posting's
                # first delta is absolute, so any block boundary is a clean
                # random-access point — mirrors skip_doc_off)
                pd_nb = _varbyte_nbytes(d.astype(np.uint64))
                pd_off = np.r_[np.int64(0), np.cumsum(pd_nb)]
                flat_start = np.r_[np.int64(0),
                                   np.cumsum(pcounts.astype(np.int64))]
                row["skip_pos_off"] = \
                    pd_off[flat_start[block_starts]].astype(np.int64).tolist()
        rows.append(row)
    return rows


def pack_postings_frame(
    pdf: pd.DataFrame,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = MAX_POSTINGS_PER_ROW,
    with_positions: bool = False,
    codec: str = "varbyte",
) -> pd.DataFrame:
    """Pack a (doc_id, term, tf, fieldnorm[, positions]) frame into shard rows.

    Input need not be sorted; NULL-term marker rows must already be removed.

    Fully vectorized ACROSS terms: with a Zipf vocabulary most terms have
    1-2 postings, so per-term numpy calls would pay fixed overhead millions
    of times per segment. Instead every quantity — block boundaries, delta
    gaps, varbyte streams, skip maxima — is computed once over the whole
    sorted frame with reduceat/cumsum, and per-term rows are produced by
    slicing the shared buffers. Terms longer than ``max_postings_per_row``
    (rare mega-terms) fall back to the sharding path (pack_term)."""
    if len(pdf) == 0:
        return _empty_packed_frame()
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    norms = pdf["fieldnorm"].to_numpy()[order].astype(np.int64)
    pos = pdf["positions"].to_numpy()[order] if with_positions else None

    uniq, starts = np.unique(terms, return_index=True)
    g_start = starts.astype(np.int64)
    g_end = np.r_[g_start[1:], np.int64(terms.size)]
    g_len = g_end - g_start

    big = g_len > max_postings_per_row
    out_extra: list[dict] = []
    if big.any():
        for i in np.flatnonzero(big):
            s, e = g_start[i], g_end[i]
            plists = list(pos[s:e]) if pos is not None else None
            out_extra.extend(pack_term(str(uniq[i]), ids[s:e], tfs[s:e],
                                       norms[s:e], plists, block_size,
                                       max_postings_per_row, codec))
        keep = ~np.repeat(big, g_len)
        terms, ids, tfs, norms = terms[keep], ids[keep], tfs[keep], norms[keep]
        if pos is not None:
            pos = pos[keep]
        uniq = uniq[~big]
        g_len = g_len[~big]
        g_end = np.cumsum(g_len)
        g_start = g_end - g_len
        if uniq.size == 0:
            return pd.DataFrame(out_extra, columns=POSTINGS_COLUMNS)

    n = ids.size
    # per-posting offset within its term group, block index, block starts
    within = np.arange(n, dtype=np.int64) - np.repeat(g_start, g_len)
    is_block_start = (within % block_size) == 0
    b_start = np.flatnonzero(is_block_start)
    b_end = np.r_[b_start[1:], np.int64(n)]
    # a block never crosses a term boundary (groups start new blocks), but a
    # group's last block may be cut short by the group end:
    b_end = np.minimum(b_end, np.repeat(g_end, _blocks_per_group(g_len, block_size)))
    b_last = b_end - 1

    # delta-gap doc ids, absolute at block starts
    deltas = np.empty(n, dtype=np.int64)
    deltas[1:] = ids[1:] - ids[:-1]
    deltas[b_start] = ids[b_start]

    # codec streams for the whole segment, then per-term slices (terms
    # always start new blocks, so term boundaries are block boundaries and
    # the block-oriented bitpack codec slices cleanly too)
    doc_stream = stream_encode(deltas.astype(np.uint64), codec, b_start)
    tf_stream = stream_encode(tfs.astype(np.uint64), codec, b_start)
    norm_stream = norms.astype(np.uint8).tobytes()
    d_nb = stream_nbytes(deltas.astype(np.uint64), codec, b_start)
    t_nb = stream_nbytes(tfs.astype(np.uint64), codec, b_start)
    d_off = np.r_[np.int64(0), np.cumsum(d_nb)]   # n+1 byte offsets
    t_off = np.r_[np.int64(0), np.cumsum(t_nb)]

    # per-block skip data (global, then split per term)
    blk_last_id = ids[b_last]
    blk_count = (b_end - b_start).astype(np.int32)
    blk_max_tf = np.maximum.reduceat(tfs, b_start).astype(np.int32)
    blk_min_norm = np.minimum.reduceat(norms, b_start).astype(np.int32)
    # byte offsets of each block RELATIVE to its term's stream start
    term_of_block = np.repeat(np.arange(uniq.size, dtype=np.int64),
                              _blocks_per_group(g_len, block_size))
    blk_doc_off = d_off[b_start] - d_off[g_start[term_of_block]]
    blk_tf_off = t_off[b_start] - t_off[g_start[term_of_block]]

    nb_per_term = _blocks_per_group(g_len, block_size)
    blk_bounds = np.r_[np.int64(0), np.cumsum(nb_per_term)]

    mv_doc = memoryview(doc_stream)
    mv_tf = memoryview(tf_stream)
    mv_norm = memoryview(norm_stream)

    k = uniq.size
    doc_bins = [bytes(mv_doc[d_off[g_start[i]]:d_off[g_end[i]]]) for i in range(k)]
    tf_bins = [bytes(mv_tf[t_off[g_start[i]]:t_off[g_end[i]]]) for i in range(k)]
    norm_bins = [bytes(mv_norm[g_start[i]:g_end[i]]) for i in range(k)]
    def _obj_col(arrs: list) -> np.ndarray:
        # object array of per-term ndarrays; a plain list would collapse to
        # a 2D block when all lengths match, which Arrow can't convert
        out = np.empty(len(arrs), dtype=object)
        out[:] = arrs
        return out

    sk_last = _obj_col(np.split(blk_last_id, blk_bounds[1:-1]))
    sk_cnt = _obj_col(np.split(blk_count, blk_bounds[1:-1]))
    sk_mtf = _obj_col(np.split(blk_max_tf, blk_bounds[1:-1]))
    sk_mnm = _obj_col(np.split(blk_min_norm, blk_bounds[1:-1]))
    sk_doff = _obj_col(np.split(blk_doc_off, blk_bounds[1:-1]))
    sk_toff = _obj_col(np.split(blk_tf_off, blk_bounds[1:-1]))

    data = {
        "term": uniq.astype(object),
        "shard": np.zeros(k, dtype=np.int64),
        "min_doc_id": ids[g_start],
        "last_doc_id": ids[g_end - 1],
        "doc_freq": g_len.astype(np.int32),
        "num_blocks": nb_per_term.astype(np.int32),
        "doc_ids_bin": doc_bins,
        "tfs_bin": tf_bins,
        "norms_bin": norm_bins,
        "skip_last_doc_id": sk_last,
        "skip_doc_count": sk_cnt,
        "skip_max_tf": sk_mtf,
        "skip_min_norm": sk_mnm,
        "skip_doc_off": sk_doff,
        "skip_tf_off": sk_toff,
        "pos_counts_bin": [None] * k,
        "pos_deltas_bin": [None] * k,
        "skip_pos_off": [None] * k,
    }

    if pos is not None:
        pcounts = np.fromiter((len(p) for p in pos), dtype=np.int64, count=n)
        p_end = np.cumsum(pcounts)
        p_start = p_end - pcounts
        flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pos]) \
            if n else np.empty(0, dtype=np.int64)
        pdelta = np.empty(flat.size, dtype=np.int64)
        if flat.size:
            pdelta[1:] = flat[1:] - flat[:-1]
            pdelta[p_start[pcounts > 0]] = flat[p_start[pcounts > 0]]
        pc_stream = varbyte_encode(pcounts.astype(np.uint64))
        pd_stream = varbyte_encode(pdelta.astype(np.uint64))
        pc_nb = _varbyte_nbytes(pcounts.astype(np.uint64))
        pd_nb = _varbyte_nbytes(pdelta.astype(np.uint64))
        pc_off = np.r_[np.int64(0), np.cumsum(pc_nb)]
        pd_off = np.r_[np.int64(0), np.cumsum(pd_nb)]
        # positions per term = positions of its postings (contiguous)
        mv_pc = memoryview(pc_stream)
        mv_pd = memoryview(pd_stream)
        # pc_off is indexed by posting index; pd_off by flat-position index
        grp_flat_start = p_start[g_start]
        grp_flat_end = np.r_[grp_flat_start[1:], np.int64(flat.size)]
        data["pos_counts_bin"] = [
            bytes(mv_pc[pc_off[g_start[i]]:pc_off[g_end[i]]]) for i in range(k)]
        data["pos_deltas_bin"] = [
            bytes(mv_pd[pd_off[grp_flat_start[i]]:pd_off[grp_flat_end[i]]])
            for i in range(k)]
        # per-block byte offsets into pos_deltas_bin, RELATIVE to the
        # term's stream start (mirrors blk_doc_off; posting-leading deltas
        # are absolute so block boundaries are random-access points)
        blk_pos_off = (pd_off[p_start[b_start]]
                       - pd_off[grp_flat_start[term_of_block]])
        data["skip_pos_off"] = \
            _obj_col(np.split(blk_pos_off.astype(np.int64),
                              blk_bounds[1:-1]))

    frame = pd.DataFrame(data, columns=POSTINGS_COLUMNS)
    if out_extra:
        frame = pd.concat([pd.DataFrame(out_extra, columns=POSTINGS_COLUMNS),
                           frame], ignore_index=True)
        frame = frame.sort_values(["term", "shard"]).reset_index(drop=True)
    return frame


def _blocks_per_group(g_len: np.ndarray, block_size: int) -> np.ndarray:
    return -(-g_len // block_size)


_PACKED_DTYPES = {
    "term": object, "shard": np.int64, "min_doc_id": np.int64,
    "last_doc_id": np.int64, "doc_freq": np.int32, "num_blocks": np.int32,
    "doc_ids_bin": object, "tfs_bin": object, "norms_bin": object,
    "skip_last_doc_id": object, "skip_doc_count": object,
    "skip_max_tf": object, "skip_min_norm": object, "skip_doc_off": object,
    "skip_tf_off": object, "pos_counts_bin": object, "pos_deltas_bin": object,
    "skip_pos_off": object,
}


def _empty_packed_frame() -> pd.DataFrame:
    # dtypes must survive Arrow conversion (a bare [] column defaults to
    # float64, which Arrow refuses to cast to list/binary types)
    return pd.DataFrame({c: pd.Series(dtype=_PACKED_DTYPES[c])
                         for c in POSTINGS_COLUMNS})


def decode_row(row: dict | pd.Series, block_size: int = BLOCK_SIZE,
               codec: str = "varbyte"):
    """Decode one shard row -> (doc_ids, tfs, norms) int64 arrays."""
    n = int(row["doc_freq"])
    deltas = stream_decode(row["doc_ids_bin"], count=n,
                           codec=codec).astype(np.int64)
    ids = delta_decode_blocks(deltas, block_size)
    tfs = stream_decode(row["tfs_bin"], count=n, codec=codec).astype(np.int64)
    norms = np.frombuffer(row["norms_bin"], dtype=np.uint8).astype(np.int64)
    return ids, tfs, norms


def decode_row_blocks(row: dict | pd.Series, block_idx: np.ndarray,
                      codec: str = "varbyte"):
    """Random-access decode of selected blocks of one shard row.

    ``block_idx``: sorted unique block indices. Returns (doc_ids, tfs,
    norms) for exactly those blocks' postings. Consecutive runs of blocks
    are decoded with ONE varbyte call each (the skip entries' byte offsets
    give random access; block-leading deltas are stored absolute) — this is
    the engine's analogue of the reference's skip-pointer block seek
    (src/segment/format.h:230-239, src/segment/scan.c:448-500).
    """
    block_idx = np.asarray(block_idx, dtype=np.int64)
    counts = np.asarray(row["skip_doc_count"], dtype=np.int64)
    doc_off = np.asarray(row["skip_doc_off"], dtype=np.int64)
    tf_off = np.asarray(row["skip_tf_off"], dtype=np.int64)
    post_start = np.cumsum(np.r_[np.int64(0), counts])
    nrm_all = np.frombuffer(row["norms_bin"], dtype=np.uint8)
    dbin, tbin = row["doc_ids_bin"], row["tfs_bin"]

    # consecutive runs give the exact BYTE spans to read (skip offsets are
    # per-block; a run [a..b] spans [off[a], off[b+1]) )
    cut = np.flatnonzero(np.diff(block_idx) != 1) + 1
    runs = np.split(block_idx, cut)

    if codec in ("varbyte", "raw"):
        # GATHER fast path: concatenate every selected run's byte span and
        # decode in ONE stream pass. Valid because values never span block
        # boundaries and each block's leading delta is stored ABSOLUTE, so
        # a single global cumsum + per-block carried-prefix subtraction
        # reconstructs ids across run boundaries too. One scattered
        # per-block decode costs ~80 us of fixed numpy overhead; this is
        # 2 stream calls total regardless of how many blocks were picked.
        dbuf = np.frombuffer(dbin, dtype=np.uint8)
        tbuf = np.frombuffer(tbin, dtype=np.uint8)
        d_parts, t_parts = [], []
        for run in runs:
            a, b = int(run[0]), int(run[-1])
            d_end = int(doc_off[b + 1]) if b + 1 < doc_off.size else dbuf.size
            t_end = int(tf_off[b + 1]) if b + 1 < tf_off.size else tbuf.size
            d_parts.append(dbuf[int(doc_off[a]):d_end])
            t_parts.append(tbuf[int(tf_off[a]):t_end])
        bc = counts[block_idx]
        n_total = int(bc.sum())
        deltas = stream_decode(
            d_parts[0] if len(d_parts) == 1 else np.concatenate(d_parts),
            count=n_total, codec=codec).astype(np.int64)
        g = np.cumsum(deltas)
        ends = np.cumsum(bc)
        starts = ends - bc
        prefix = np.where(starts > 0, g[starts - 1], np.int64(0))
        ids = g - np.repeat(prefix, bc)
        tfs = stream_decode(
            t_parts[0] if len(t_parts) == 1 else np.concatenate(t_parts),
            count=n_total, codec=codec).astype(np.int64)
        # row-local posting positions of the selected blocks (norm gather)
        pos = (np.repeat(post_start[block_idx], bc)
               + np.arange(n_total, dtype=np.int64)
               - np.repeat(starts, bc))
        return ids, tfs, nrm_all[pos].astype(np.int64)

    # bitpack: block-group wire format — keep the per-run decode
    ids_l, tfs_l, norms_l = [], [], []
    for run in runs:
        a, b = int(run[0]), int(run[-1])
        n_run = int(post_start[b + 1] - post_start[a])
        deltas = stream_decode(dbin, offset=int(doc_off[a]), count=n_run,
                               codec=codec)
        g = np.cumsum(deltas.astype(np.int64))
        # block-leading deltas are absolute: subtract each block's carried
        # prefix (same trick as decode_positions)
        local_starts = post_start[a:b + 1] - post_start[a]
        prefix = np.r_[np.int64(0), g[local_starts[1:] - 1]]
        ids_l.append(g - np.repeat(prefix, counts[a:b + 1]))
        tfs_l.append(stream_decode(tbin, offset=int(tf_off[a]), count=n_run,
                                   codec=codec).astype(np.int64))
        norms_l.append(nrm_all[post_start[a]:post_start[b + 1]].astype(np.int64))
    return (np.concatenate(ids_l), np.concatenate(tfs_l),
            np.concatenate(norms_l))


def decode_positions_blocks(row: dict | pd.Series, block_idx: np.ndarray):
    """Random-access decode of selected blocks' position lists.

    ``block_idx``: sorted unique block indices. Returns (posting_idx,
    positions): row-local posting offsets covered by those blocks and one
    int64 array per covered posting. Uses the ``skip_pos_off`` per-block
    byte offsets (round-4 format addition); legacy rows without them fall
    back to a full :func:`decode_positions` pass."""
    if row["pos_counts_bin"] is None:
        return None, None
    spo = row["skip_pos_off"] if "skip_pos_off" in row else None
    block_idx = np.asarray(block_idx, dtype=np.int64)
    n = int(row["doc_freq"])
    counts = varbyte_decode(row["pos_counts_bin"], count=n).astype(np.int64)
    cnt_blocks = np.asarray(row["skip_doc_count"], dtype=np.int64)
    post_start = np.cumsum(np.r_[np.int64(0), cnt_blocks])
    if spo is None or (hasattr(spo, "__len__") and len(spo) == 0):
        full = decode_positions(row)
        idx = np.concatenate([np.arange(post_start[int(b)],
                                        post_start[int(b) + 1])
                              for b in block_idx]) if block_idx.size else \
            np.empty(0, dtype=np.int64)
        return idx, [full[int(i)] for i in idx]
    pos_off = np.asarray(spo, dtype=np.int64)
    cut = np.flatnonzero(np.diff(block_idx) != 1) + 1
    runs = np.split(block_idx, cut) if block_idx.size else []
    idx_l: list[np.ndarray] = []
    out: list[np.ndarray] = []
    for run in runs:
        a, b = int(run[0]), int(run[-1])
        p0, p1 = int(post_start[a]), int(post_start[b + 1])
        c = counts[p0:p1]
        total = int(c.sum())
        deltas = varbyte_decode(row["pos_deltas_bin"],
                                offset=int(pos_off[a]),
                                count=total).astype(np.int64)
        ends = np.cumsum(c)
        starts = ends - c
        g = np.cumsum(deltas)
        prefix = np.r_[np.int64(0), g[ends[:-1] - 1]]
        vals = g - np.repeat(prefix, c)
        out.extend(vals[s:e] for s, e in zip(starts, ends))
        idx_l.append(np.arange(p0, p1, dtype=np.int64))
    idx = np.concatenate(idx_l) if idx_l else np.empty(0, dtype=np.int64)
    return idx, out


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
