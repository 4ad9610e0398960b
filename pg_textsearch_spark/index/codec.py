"""Vectorized varbyte (LEB128) posting-list codec.

The reference compresses each 128-doc posting block with delta + minimal-bit
packing (reference: src/segment/compression.c:199-343). We keep the same
*logical* layout — per-block delta-gap doc_ids, term frequencies, 1-byte
fieldnorms, per-block skip entries — but use varbyte group encoding, which
the north star explicitly allows and which vectorizes cleanly in numpy
(no Python-per-posting loops anywhere).

Encoding: classic 7-bit groups, little-endian, high bit = continuation.
Both encode and decode are O(bytes) numpy array ops.
"""

from __future__ import annotations

import numpy as np

__all__ = ["varbyte_encode", "varbyte_decode", "delta_encode_blocks",
           "delta_decode_blocks", "stream_encode", "stream_decode",
           "stream_nbytes"]

_MASKS = np.uint64(0x7F)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints to a varbyte stream."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    bitlen = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        bitlen[nz] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((bitlen + 6) // 7, 1)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    max_b = int(nbytes.max())
    for b in range(max_b):
        sel = nbytes > b
        pos = starts[sel] + b
        payload = (vals[sel] >> np.uint64(7 * b)) & _MASKS
        cont = np.where(nbytes[sel] > b + 1, 0x80, 0).astype(np.uint64)
        out[pos] = (payload | cont).astype(np.uint8)
    return out.tobytes()


def varbyte_decode(buf: bytes | np.ndarray, offset: int = 0, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream back to uint64.

    If ``count`` is given, decodes exactly that many values starting at byte
    ``offset`` (supports random access into a block via skip offsets).
    """
    raw = np.frombuffer(buf, dtype=np.uint8)
    if offset:
        raw = raw[offset:]
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = raw < 0x80
    if count is not None:
        n_last = np.cumsum(is_last)
        stop = np.searchsorted(n_last, count) + 1
        raw = raw[:stop]
        is_last = is_last[:stop]
    # group id per byte: number of completed values before this byte
    gid = np.zeros(raw.size, dtype=np.int64)
    gid[1:] = np.cumsum(is_last)[:-1]
    starts = np.flatnonzero(np.r_[True, is_last[:-1]])
    within = np.arange(raw.size, dtype=np.int64) - starts[gid]
    payload = (raw.astype(np.uint64) & _MASKS) << (np.uint64(7) * within.astype(np.uint64))
    out = np.add.reduceat(payload, starts)
    return out.astype(np.uint64)


def delta_encode_blocks(doc_ids: np.ndarray, block_size: int = 128) -> np.ndarray:
    """Delta-gap within blocks; the first entry of each block stays absolute
    (reference block layout: src/segment/compression.c:199-259)."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    deltas = np.empty_like(ids)
    deltas[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=deltas[1:])
    block_starts = np.arange(0, ids.size, block_size)[1:]
    deltas[block_starts] = ids[block_starts]  # reset at block boundary
    return deltas


def delta_decode_blocks(deltas: np.ndarray, block_size: int = 128) -> np.ndarray:
    """Inverse of delta_encode_blocks, vectorized via per-block cumsum."""
    d = np.asarray(deltas, dtype=np.int64)
    n = d.size
    if n == 0:
        return d
    nblocks = (n + block_size - 1) // block_size
    padded = np.zeros(nblocks * block_size, dtype=np.int64)
    padded[:n] = d
    # block-start deltas are absolute, so a per-block cumsum reconstructs ids
    out = np.cumsum(padded.reshape(nblocks, block_size), axis=1).reshape(-1)
    return out[:n]


# ---------------------------------------------------------------- codecs
# The reference's compress_segments GUC / format flags
# (src/segment/format.h:241-245, test/sql/compression.sql) toggle between
# compressed and raw posting streams. 'varbyte' = delta+varbyte (default);
# 'raw' = fixed-width little-endian uint64 per value (no compression —
# width 8 because block-leading deltas are absolute 64-bit hash doc_ids —
# but identical block/skip layout so every query path is codec-agnostic).

def stream_nbytes(values: np.ndarray, codec: str = "varbyte") -> np.ndarray:
    """Per-value encoded byte width (for skip-entry byte offsets)."""
    vals = np.asarray(values, dtype=np.uint64)
    if codec == "raw":
        return np.full(vals.shape, 8, dtype=np.int64)
    nbits = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        nbits[nz] += 1
        tmp >>= np.uint64(1)
    return np.maximum((nbits + 6) // 7, 1)


def stream_encode(values: np.ndarray, codec: str = "varbyte") -> bytes:
    if codec == "raw":
        return np.ascontiguousarray(values, dtype="<u8").tobytes()
    return varbyte_encode(values)


def stream_decode(buf, offset: int = 0, count: int | None = None,
                  codec: str = "varbyte") -> np.ndarray:
    if codec == "raw":
        raw = np.frombuffer(buf, dtype=np.uint8)
        if offset:
            raw = raw[offset:]
        if count is not None:
            raw = raw[:8 * count]
        return np.frombuffer(raw.tobytes(), dtype="<u8")
    return varbyte_decode(buf, offset, count)
