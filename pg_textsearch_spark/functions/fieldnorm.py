"""Document-length quantization (Lucene SmallFloat / Tantivy fieldnorm).

Reproduces the 256-entry decode table the reference stores one byte per doc
(reference: src/segment/fieldnorm.c:17-335 — values 0..39 exact, then groups
of 8 ids whose step doubles each group). BM25 uses the *quantized* doc length
dl' = decode(encode(dl)) (reference: src/types/query.c:936-944,
src/scoring/bmw.c:1450-1457).

All operations are numpy-vectorized: encode is one ``np.searchsorted`` over
the monotone table; decode is one fancy-index.
"""

from __future__ import annotations

import numpy as np

__all__ = ["DECODE_TABLE", "encode_fieldnorm", "decode_fieldnorm", "quantize_len"]


def _build_table() -> np.ndarray:
    vals = list(range(40))  # ids 0..39: exact
    for ident in range(40, 256):
        g = (ident - 40) // 8
        step = 1 << (g + 1)
        base = 40 + 16 * ((1 << g) - 1)
        vals.append(base + ((ident - 40) - 8 * g) * step)
    return np.asarray(vals, dtype=np.int64)


#: Monotone increasing; DECODE_TABLE[255] == 2013265944 (matches the
#: reference's last table entry, src/segment/fieldnorm.c).
DECODE_TABLE: np.ndarray = _build_table()


def encode_fieldnorm(lengths) -> np.ndarray:
    """Largest id i with DECODE_TABLE[i] <= length (uint8 per doc)."""
    arr = np.asarray(lengths, dtype=np.int64)
    idx = np.searchsorted(DECODE_TABLE, arr, side="right") - 1
    return np.clip(idx, 0, 255).astype(np.uint8)


def decode_fieldnorm(codes) -> np.ndarray:
    return DECODE_TABLE[np.asarray(codes, dtype=np.int64)]


def quantize_len(lengths) -> np.ndarray:
    """decode(encode(dl)) — the dl the BM25 formula actually sees."""
    return decode_fieldnorm(encode_fieldnorm(lengths))


def sql_quantize_expr(dl_expr: str, max_len: int = 10000) -> str:
    """ANSI-SQL expression computing quantize_len(dl) via an inline table.

    Used to express the engine's quantization inside DuckDB oracle SQL
    (the reference does the same in test/sql/validation.sql:19-70).
    Only table values <= max_len are inlined; callers must ensure doc
    lengths stay below max_len (true for all test corpora).
    """
    vals = [int(v) for v in DECODE_TABLE if v <= max_len]
    values = ", ".join(f"({v})" for v in vals)
    return (
        f"(SELECT MAX(v) FROM (VALUES {values}) AS fnorm(v) "
        f"WHERE v <= {dl_expr})"
    )
