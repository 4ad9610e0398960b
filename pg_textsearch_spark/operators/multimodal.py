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
