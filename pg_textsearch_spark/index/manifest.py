"""Index manifest — the Spark-native analogue of the reference's metapage.

The reference keeps level heads/counts, total_docs, total_len, k1, b and the
text config in index page 0 (reference: src/index/metapage.h:30-106). Here
the same state lives in ``manifest.json`` next to the segment directories,
committed atomically (temp file + rename) like an Iceberg/Delta snapshot:

- ``levels``: level -> list of live segment records (id, doc range, stats)
- corpus totals (``total_docs``, ``total_len`` with RAW lengths — see
  SURVEY.md §1.4 avgdl note)
- build options + tokenizer version (scores depend on both)
- per-segment lineage + build metrics (terms, postings, bytes, skew factor)
  — the north-star observability requirement
- a monotone ``next_segment`` counter so merges never reuse ids

Per-segment ``_SEG_SUCCESS.json`` markers written by executors are the
checkpoint units: a re-run build skips every segment whose marker exists
(crash-safe finalize-then-mark ordering, reference: src/access/build.c:194-228).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field

from ..config import Bm25Options

MANIFEST_NAME = "manifest.json"
SEG_MARKER = "_SEG_SUCCESS.json"
TOKENIZER_VERSION = 1
# v2: global docs/ docmap removed; per-segment docmaps carry
# content_sha256 + source metadata. v1 indexes lack those columns, so
# load refuses them (the reference's index-version gate on the metapage).
FORMAT_VERSION = 2


@dataclass
class SegmentRecord:
    segment_id: str
    level: int
    num_docs: int
    total_len: int
    num_terms: int
    num_postings: int
    bytes: int
    min_doc_id: int
    max_doc_id: int
    max_doc_freq: int
    skew_factor: float          # max_doc_freq / mean_doc_freq
    lineage: dict = field(default_factory=dict)

    def to_dict(self) -> dict:
        return dict(self.__dict__)

    @classmethod
    def from_dict(cls, d: dict) -> "SegmentRecord":
        return cls(**{k: v for k, v in d.items() if k in cls.__dataclass_fields__})


class Manifest:
    def __init__(self, path: str, opts: Bm25Options):
        self.path = path
        self.opts = opts
        self.levels: dict[int, list[SegmentRecord]] = {}
        self.next_segment = 0
        self.created_at = time.time()
        self.updated_at = self.created_at

    # -- totals (global stats, operator Q3) --------------------------------
    @property
    def segments(self) -> list[SegmentRecord]:
        return [s for lvl in sorted(self.levels) for s in self.levels[lvl]]

    @property
    def total_docs(self) -> int:
        return sum(s.num_docs for s in self.segments)

    @property
    def total_len(self) -> int:
        return sum(s.total_len for s in self.segments)

    @property
    def avgdl(self) -> float:
        n = self.total_docs
        return (self.total_len / n) if n else 1.0

    def new_segment_id(self) -> str:
        sid = f"seg-{self.next_segment:06d}"
        self.next_segment += 1
        return sid

    def add_segment(self, rec: SegmentRecord) -> None:
        self.levels.setdefault(rec.level, []).append(rec)

    def replace_segments(self, removed_ids: set[str], added: list[SegmentRecord]) -> None:
        for lvl in list(self.levels):
            self.levels[lvl] = [s for s in self.levels[lvl]
                                if s.segment_id not in removed_ids]
            if not self.levels[lvl]:
                del self.levels[lvl]
        for rec in added:
            self.add_segment(rec)

    def segment_dir(self, segment_id: str) -> str:
        return os.path.join(self.path, "segments", segment_id)

    # -- persistence --------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "format_version": FORMAT_VERSION,
            "tokenizer_version": TOKENIZER_VERSION,
            "options": self.opts.to_dict(),
            "created_at": self.created_at,
            "updated_at": self.updated_at,
            "next_segment": self.next_segment,
            "total_docs": self.total_docs,
            "total_len": self.total_len,
            "levels": {str(l): [s.to_dict() for s in segs]
                       for l, segs in self.levels.items()},
        }

    def save(self) -> None:
        self.updated_at = time.time()
        os.makedirs(self.path, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".manifest.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(self.to_dict(), f, indent=1)
            os.replace(tmp, os.path.join(self.path, MANIFEST_NAME))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    @classmethod
    def load(cls, path: str) -> "Manifest":
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            d = json.load(f)
        ver = d.get("format_version", 0)
        if ver != FORMAT_VERSION:
            raise ValueError(
                f"index at {path} has format_version {ver}; this engine "
                f"reads version {FORMAT_VERSION} — rebuild the index")
        m = cls(path, Bm25Options.from_dict(d["options"]))
        m.created_at = d["created_at"]
        m.updated_at = d["updated_at"]
        m.next_segment = d["next_segment"]
        m.levels = {int(l): [SegmentRecord.from_dict(s) for s in segs]
                    for l, segs in d["levels"].items()}
        return m

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, MANIFEST_NAME))
