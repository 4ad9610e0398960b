"""Engine configuration (reference: index WITH-options + GUCs).

Mirrors the reference's option surface: ``text_config`` (required there),
``k1``/``b`` with the same defaults and valid ranges
(reference: src/constants.h:74-75, src/access/build.c:644-698,
README.md:688-692) and the LSM/GUC knobs (src/mod.c:181-347).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75
DEFAULT_LIMIT = 1000          # reference: pg_textsearch.default_limit
MAX_LIMIT = 100_000
SEGMENTS_PER_LEVEL = 8        # reference: src/constants.h:70-71
MAX_LEVELS = 8
BLOCK_SIZE = 128              # postings per block (reference: format.h:208)


@dataclass(frozen=True)
class Bm25Options:
    text_config: str = "english"
    k1: float = DEFAULT_K1
    b: float = DEFAULT_B
    # avgdl convention: 'raw' (engine default — metapage total_len is the sum
    # of raw doc lengths, reference src/access/build.c:1524-1557) or
    # 'quantized' (the reference SQL oracle's convention,
    # test/sql/validation.sql:131-141). See SURVEY.md §1.4.
    avgdl_mode: str = "raw"
    block_size: int = BLOCK_SIZE
    segments_per_level: int = SEGMENTS_PER_LEVEL
    docs_per_segment: int = 1 << 16
    default_limit: int = DEFAULT_LIMIT
    store_positions: bool = False   # positions sidecar enables phrase queries
    # reference compress_segments GUC (src/segment/format.h:241-245,
    # test/sql/compression.sql): False stores raw fixed-width posting
    # streams with the identical block/skip layout
    compress_segments: bool = True
    # posting-stream codec: '' derives from compress_segments ('varbyte' /
    # 'raw'); 'bitpack' selects per-block frame-of-reference bit packing —
    # the parity codec for the reference's compressed format
    # (src/segment/compression.c:199-259, flags format.h:241-245)
    posting_codec: str = ""
    # build-side memory budget (B13/B14 — reference maintenance_work_mem
    # flush, src/access/build.c:1234-1248, and the memtable auto-spill
    # triggers, build.c:263-295). None = partition == flush unit (default:
    # segments are already sized by docs_per_segment). When set, the pack
    # stage streams Arrow batches through mapInPandas and flushes an
    # independent sub-segment whenever a bucket's buffered working set
    # exceeds the budget — an executor never materializes more than
    # ~budget bytes per bucket no matter how skewed the doc-id bucketing.
    spill_budget_bytes: int | None = None
    # document-id layout: 'none' keeps user/hashed ids; 'length' assigns
    # dense internal ids in ascending byte-length order (original ids kept
    # in the docmap as source_id). Length-ordered blocks give block-max
    # bounds real variance, enabling single-term early termination on
    # corpora whose natural id order is uncorrelated with content
    # (VALIDATION.md analysis; classic document-reordering layout —
    # Lucene's index sorting is the public precedent).
    # 'auto' (default) resolves at build time: 'length' when doc ids are
    # auto-assigned (id_col=None -> xxhash64 ids, provably uncorrelated
    # with content, so block-max bounds would be flat and BMW pruning
    # dark), 'none' when the caller supplies ids (their order may carry
    # meaning, and search() then returns them directly). The manifest
    # stores the RESOLVED value. Cost note: 'length' adds one
    # slim-row range sort + a full-corpus remap join to the build — the
    # classic index-sorting trade (pay one build shuffle, prune blocks on
    # every query forever).
    reorder_docs: str = "auto"

    @property
    def codec(self) -> str:
        if self.posting_codec:
            return self.posting_codec
        return "varbyte" if self.compress_segments else "raw"

    def __post_init__(self) -> None:
        if not (0.1 <= self.k1 <= 10.0):
            raise ValueError("k1 must be in [0.1, 10.0]")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError("b must be in [0.0, 1.0]")
        if self.avgdl_mode not in ("raw", "quantized"):
            raise ValueError("avgdl_mode must be 'raw' or 'quantized'")
        if self.reorder_docs not in ("auto", "none", "length"):
            raise ValueError(
                "reorder_docs must be 'auto', 'none' or 'length'")
        if self.posting_codec not in ("", "varbyte", "raw", "bitpack"):
            raise ValueError(
                "posting_codec must be '', 'varbyte', 'raw' or 'bitpack'")
        if self.posting_codec == "bitpack" and self.block_size > 256:
            raise ValueError("bitpack requires block_size <= 256")
        if self.spill_budget_bytes is not None and self.spill_budget_bytes < 4096:
            raise ValueError("spill_budget_bytes must be >= 4096")

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Bm25Options":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})
