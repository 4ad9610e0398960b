"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``BINARY`` columns with a typed
metadata struct (modality, byte size, checksum). Real decoding (image
resize, audio resample, video frame-sampling) needs codec libraries this
container doesn't ship, so the decode kernels are STUBBED behind
``decode_stub`` — but everything Spark-side is real and tested: the Arrow
batch schema, the ``mapInPandas`` feature-extraction pass over binary
buffers, chunk/frame arithmetic, and partition behavior.

``extract_features`` computes deterministic features from the raw bytes
(length, md5-derived checksum, fixed-stride "frame" count) — a stand-in
with the exact dataflow shape of a Pandas-UDF decoder — and has a DuckDB
oracle twin, so even the multimodal plumbing goes through the driver's
correctness gate.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 64  # fixed-stride fake "frame" size for frame-count features


def to_blob_table(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  modality: str = "text") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata —
    the canonical multimodal table shape (payload stays unparsed until a
    decode pass; metadata columns are prunable/pushdown-friendly)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long")
            .alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, modality: str):
    """Placeholder for the real codec call (PIL / torchaudio / pyav).

    Deliberately raises: the container has no media libraries. The Spark
    plumbing around it (``extract_features``) uses deterministic
    byte-level features instead.
    """
    raise NotImplementedError(
        f"no codec for modality {modality!r} in this environment; "
        "extract_features uses deterministic byte-level features")


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Features are deterministic byte-level stand-ins for decoded media
    features: payload size, 32-bit md5 checksum, fixed-stride frame count
    (= ceil(n_bytes / FRAME_BYTES)), and first-byte value. The batch shape
    (binary buffers in, flat feature rows out) is exactly what a real
    decoder UDF uses."""
    schema = ("doc_id long, n_bytes long, checksum long, "
              "n_frames long, first_byte long")

    def run(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            n = len(pdf)
            n_bytes = np.fromiter((len(p) for p in payloads),
                                  dtype=np.int64, count=n)
            checksum = np.fromiter(
                (int(hashlib.md5(bytes(p)).hexdigest()[:8], 16)
                 for p in payloads), dtype=np.int64, count=n)
            n_frames = -(-n_bytes // FRAME_BYTES)
            first = np.fromiter(
                (p[0] if len(p) else -1 for p in payloads),
                dtype=np.int64, count=n)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy(),
                "n_bytes": n_bytes,
                "checksum": checksum,
                "n_frames": n_frames,
                "first_byte": first,
            })

    return blobs.select("doc_id", "payload").mapInPandas(run, schema)


def extract_features_oracle_sql(table: str = "documents",
                                text_col: str = "text",
                                id_col: str = "doc_id") -> str:
    """DuckDB twin: md5 over the utf-8 bytes equals Spark's md5 over
    encode(text,'UTF-8'); frame count is ceil-division."""
    return f"""
SELECT {id_col} AS doc_id,
       octet_length(encode({text_col}))::BIGINT AS n_bytes,
       ('0x' || substring(md5({text_col}), 1, 8))::UBIGINT::BIGINT AS checksum,
       ((octet_length(encode({text_col})) + {FRAME_BYTES - 1}) // {FRAME_BYTES})::BIGINT
         AS n_frames,
       CASE WHEN octet_length(encode({text_col})) = 0 THEN -1
            ELSE ascii(substring({text_col}, 1, 1)) END::BIGINT AS first_byte
FROM {table}
"""


# --------------------------------------------- content sniffing (real)

#: magic-byte signatures (public file-format specs)
MAGIC = [
    ("image/png", b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", b"\xff\xd8\xff"),
    ("image/gif", b"GIF8"),
    ("audio/wav", b"RIFF"),
    ("application/pdf", b"%PDF-"),
]


def synth_media_blobs(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media corpus: each doc's payload is a real
    format magic prefix (doc_id mod cycles the five formats; every 6th
    doc gets no prefix = unknown binary) followed by the utf-8 text
    bytes. No external data, reproducible in SQL, exercises every
    sniffing branch."""
    c = F.encode(F.col(text_col), "UTF-8")
    sel = F.col(id_col) % 6
    payload = F.when(sel == 5, c)
    for i, (_, sig) in enumerate(MAGIC):
        payload = payload.when(sel == i, F.concat(F.lit(sig), c))
    return docs.select(F.col(id_col).alias("doc_id"),
                       payload.alias("payload"))


def sniff_mime(blobs: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Magic-byte MIME detection — pure built-in expressions (binary
    substring compare inside whole-stage codegen; NOT a stub). Returns
    (doc_id, mime, n_bytes)."""
    c = F.col(payload_col)
    mime = None
    for name, sig in MAGIC:
        cond = F.substring(c, 1, len(sig)) == F.lit(sig)
        mime = F.when(cond, name) if mime is None else mime.when(cond, name)
    mime = mime.otherwise("application/octet-stream")
    return (blobs.select("doc_id", mime.alias("mime"),
                         F.octet_length(c).cast("long").alias("n_bytes"))
            .orderBy("doc_id"))


def _blob_sql(sig: bytes) -> str:
    return "'" + "".join(f"\\x{b:02X}" for b in sig) + "'::BLOB"


def sniff_mime_oracle_sql(table: str = "documents", text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB twin of synth_media_blobs |> sniff_mime."""
    mk = []
    for i, (_, sig) in enumerate(MAGIC):
        mk.append(f"WHEN {id_col} % 6 = {i} "
                  f"THEN {_blob_sql(sig)} || encode({text_col})")
    payload = "CASE " + " ".join(mk) + f" ELSE encode({text_col}) END"
    # DuckDB has no substring over BLOB — compare the hex prefix instead
    sniff = []
    for name, sig in MAGIC:
        hexsig = sig.hex().upper()
        sniff.append(f"WHEN substring(hex(payload), 1, {2 * len(sig)}) = "
                     f"'{hexsig}' THEN '{name}'")
    mime = ("CASE " + " ".join(sniff)
            + " ELSE 'application/octet-stream' END")
    return f"""
WITH blobs AS (
  SELECT {id_col} AS doc_id, {payload} AS payload FROM {table}
)
SELECT doc_id, {mime} AS mime,
       octet_length(payload)::BIGINT AS n_bytes
FROM blobs ORDER BY doc_id
"""
