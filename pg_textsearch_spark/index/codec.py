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
           "stream_nbytes", "bitpack_encode", "bitpack_decode"]

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
    if count is not None:
        # a uint64 varbyte value is at most 10 bytes: bound the working
        # slice BEFORE the continuation-bit scan. Without this, random
        # access into a long stream paid a cumsum over every byte from
        # ``offset`` to the END of the stream per block decode — the
        # dominant cost of cold multi-MB posting reads.
        raw = raw[offset:offset + 10 * count]
    elif offset:
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
# compressed and raw posting streams; its compressed format is per-block
# minimal-bit packing (src/segment/compression.c:199-259). Codecs here:
# 'varbyte' = delta+varbyte (default); 'raw' = fixed-width little-endian
# uint64 per value (width 8 because block-leading deltas are absolute
# 64-bit hash doc_ids); 'bitpack' = per-block frame-of-reference bit
# packing (below) — the parity codec for the reference's format. All three
# share the block/skip layout so every query path is codec-agnostic.
#
# bitpack block wire format (one group per posting block, self-describing
# so decode needs no side metadata):
#   byte 0:      count-1            (counts 1..256; BLOCK_SIZE <= 256)
#   byte 1:      width w in bits    (0..64) of the non-leading values
#   bytes 2..:   varbyte(leading value)   — the block-leading delta is an
#                ABSOLUTE doc_id (codec.py delta_encode_blocks), i.e. the
#                one guaranteed-large outlier; storing it as the PFOR-style
#                exception keeps w at the size of the in-block gaps instead
#                of 64 bits (the reference stores its block-leading
#                absolutes in skip entries for the same reason)
#   then:        ceil((count-1)*w / 8) bytes of little-endian-bit-order
#                packed values
# Encode/decode are numpy-vectorized across blocks (grouped by width);
# the only Python loops are over blocks for header scanning (O(#blocks),
# not O(#postings)).


def _bitlen(vals: np.ndarray) -> np.ndarray:
    out = np.zeros(vals.shape, dtype=np.int64)
    tmp = vals.copy()
    while True:
        nz = tmp > 0
        if not nz.any():
            break
        out[nz] += 1
        tmp >>= np.uint64(1)
    return out


def _seg_arange(lens: np.ndarray) -> np.ndarray:
    """[0..lens[0]-1, 0..lens[1]-1, ...] without a Python loop."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out_starts = np.r_[np.int64(0), np.cumsum(lens)[:-1]]
    return np.arange(total, dtype=np.int64) - np.repeat(out_starts, lens)


def _ragged_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat indices covering [starts[i], starts[i]+lens[i]) per group."""
    return np.repeat(np.asarray(starts, dtype=np.int64), lens) + _seg_arange(lens)


def _bitpack_layout(values: np.ndarray, block_starts: np.ndarray):
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = vals.size
    bs = np.asarray(block_starts, dtype=np.int64)
    be = np.r_[bs[1:], np.int64(n)]
    cnts = be - bs
    if cnts.size and int(cnts.max()) > 256:
        raise ValueError("bitpack supports block_size <= 256")
    bitlen = _bitlen(vals)
    nl = bitlen.copy()
    nl[bs] = 0                       # leading value is the stored exception
    width = (np.maximum.reduceat(nl, bs) if n else
             np.empty(0, dtype=np.int64))
    lead_nb = np.maximum((bitlen[bs] + 6) // 7, 1)
    packed_nb = ((cnts - 1) * width + 7) // 8
    blk_total = 2 + lead_nb + packed_nb
    return vals, bs, be, cnts, width, lead_nb, packed_nb, blk_total


def bitpack_encode(values: np.ndarray, block_starts: np.ndarray) -> bytes:
    vals, bs, be, cnts, width, lead_nb, packed_nb, blk_total = \
        _bitpack_layout(values, block_starts)
    if vals.size == 0:
        return b""
    out = np.zeros(int(blk_total.sum()), dtype=np.uint8)
    blk_off = np.r_[np.int64(0), np.cumsum(blk_total)[:-1]]
    out[blk_off] = (cnts - 1).astype(np.uint8)
    out[blk_off + 1] = width.astype(np.uint8)
    lead_src = np.frombuffer(varbyte_encode(vals[bs]), dtype=np.uint8)
    out[_ragged_gather(blk_off + 2, lead_nb)] = lead_src
    data_off = blk_off + 2 + lead_nb
    for w in np.unique(width):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(width == w)
        m = cnts[sel] - 1            # non-leading values per block
        live = m > 0
        sel, m = sel[live], m[live]
        if sel.size == 0:
            continue
        cmax = int(m.max())
        M = np.zeros((sel.size, cmax), dtype=np.uint64)
        rows = np.repeat(np.arange(sel.size), m)
        cols = _seg_arange(m)
        M[rows, cols] = vals[_ragged_gather(bs[sel] + 1, m)]
        shifts = np.arange(w, dtype=np.uint64)
        bits = ((M[:, :, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(bits.reshape(sel.size, cmax * w), axis=1,
                             bitorder="little")
        pnb = packed_nb[sel]
        src = packed.ravel()[_ragged_gather(
            np.arange(sel.size, dtype=np.int64) * packed.shape[1], pnb)]
        out[_ragged_gather(data_off[sel], pnb)] = src
    return out.tobytes()


def bitpack_nbytes(values: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """Per-value byte widths whose prefix sums give the BLOCK-START byte
    offsets (each block's bytes are assigned to its first value; random
    access is at block granularity, which is the only granularity the skip
    entries address)."""
    vals = np.asarray(values, dtype=np.uint64)
    _, bs, _, _, _, _, _, blk_total = _bitpack_layout(vals, block_starts)
    out = np.zeros(vals.shape, dtype=np.int64)
    if vals.size:
        out[np.asarray(block_starts, dtype=np.int64)] = blk_total
    return out


def bitpack_decode(buf, offset: int = 0, count: int | None = None) -> np.ndarray:
    raw = np.frombuffer(buf, dtype=np.uint8)
    pos = int(offset)
    # header scan: O(#blocks) Python, no per-value work
    cnts_l, widths_l, firsts_l, dpos_l = [], [], [], []
    got = 0
    end = raw.size
    while (pos < end) if count is None else (got < count):
        cnt = int(raw[pos]) + 1
        w = int(raw[pos + 1])
        pos += 2
        first = 0
        shift = 0
        while True:
            byte = int(raw[pos])
            pos += 1
            first |= (byte & 0x7F) << shift
            if byte < 0x80:
                break
            shift += 7
        cnts_l.append(cnt)
        widths_l.append(w)
        firsts_l.append(first)
        dpos_l.append(pos)
        pos += ((cnt - 1) * w + 7) // 8
        got += cnt
    if count is not None and got != count:
        raise ValueError(
            f"bitpack_decode: requested {count} values but groups yielded "
            f"{got} — decode requests must cover whole blocks")
    ng = len(cnts_l)
    if ng == 0:
        return np.empty(0, dtype=np.uint64)
    cnts = np.asarray(cnts_l, dtype=np.int64)
    widths = np.asarray(widths_l, dtype=np.int64)
    dpos = np.asarray(dpos_l, dtype=np.int64)
    out = np.zeros(got, dtype=np.uint64)
    out_start = np.r_[np.int64(0), np.cumsum(cnts)[:-1]]
    out[out_start] = np.asarray(firsts_l, dtype=np.uint64)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        m = cnts[sel] - 1
        live = m > 0
        sel, m = sel[live], m[live]
        if sel.size == 0:
            continue
        cmax = int(m.max())
        rowbytes = (cmax * w + 7) // 8
        B = np.zeros((sel.size, rowbytes), dtype=np.uint8)
        pnb = ((m * w) + 7) // 8
        rows = np.repeat(np.arange(sel.size), pnb)
        cols = _seg_arange(pnb)
        B[rows, cols] = raw[_ragged_gather(dpos[sel], pnb)]
        bits = np.unpackbits(B, axis=1, count=cmax * w, bitorder="little")
        shifts = np.arange(w, dtype=np.uint64)
        V = (bits.reshape(sel.size, cmax, w).astype(np.uint64)
             << shifts).sum(axis=2, dtype=np.uint64)
        vr = np.repeat(np.arange(sel.size), m)
        vc = _seg_arange(m)
        out[_ragged_gather(out_start[sel] + 1, m)] = V[vr, vc]
    return out


def stream_nbytes(values: np.ndarray, codec: str = "varbyte",
                  block_starts: np.ndarray | None = None) -> np.ndarray:
    """Per-value encoded byte width (prefix sums give skip byte offsets).
    ``block_starts`` is required by the block-oriented 'bitpack' codec and
    ignored by the value-granular ones."""
    vals = np.asarray(values, dtype=np.uint64)
    if codec == "raw":
        return np.full(vals.shape, 8, dtype=np.int64)
    if codec == "bitpack":
        if block_starts is None:
            raise ValueError("bitpack requires block_starts")
        return bitpack_nbytes(vals, block_starts)
    nbits = _bitlen(vals)
    return np.maximum((nbits + 6) // 7, 1)


def stream_encode(values: np.ndarray, codec: str = "varbyte",
                  block_starts: np.ndarray | None = None) -> bytes:
    if codec == "raw":
        return np.ascontiguousarray(values, dtype="<u8").tobytes()
    if codec == "bitpack":
        if block_starts is None:
            raise ValueError("bitpack requires block_starts")
        return bitpack_encode(values, block_starts)
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
    if codec == "bitpack":
        return bitpack_decode(buf, offset, count)
    return varbyte_decode(buf, offset, count)
