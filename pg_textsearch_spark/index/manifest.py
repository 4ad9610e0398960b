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
SEGMENTS_PARQUET = "segments.parquet"
SEG_MARKER = "_SEG_SUCCESS.json"
TOKENIZER_VERSION = 1
# v2: global docs/ docmap removed; per-segment docmaps carry
# content_sha256 + source metadata. v1 indexes lack those columns, so
# load refuses them (the reference's index-version gate on the metapage).
# v3: segment records live in a columnar segments.parquet sidecar once the
# count crosses SEG_PARQUET_THRESHOLD (a 380k-segment index at 100 TB is
# ~100 MB of JSON but ~4 MB of parquet, and loads as one columnar scan).
# v2 (all-JSON) stays readable; v3 is written only when the sidecar is
# needed, so small indexes remain v2 and human-inspectable.
FORMAT_VERSION = 2
FORMAT_VERSION_PARQUET = 3
SEG_PARQUET_THRESHOLD = 2048


@dataclass
class SegmentRecord:
    segment_id: str
    level: int
    num_docs: int
    total_len: int
    # sum of QUANTIZED doc lengths (decode(encode(dl))) — feeds avgdl when
    # the index was built with avgdl_mode='quantized' (the reference SQL
    # oracle's convention, test/sql/validation.sql:131-141). 0 on records
    # written before this field existed; Manifest.avgdl refuses to score a
    # quantized-mode index whose records predate it.
    total_qlen: int = 0
    num_terms: int = 0
    num_postings: int = 0
    bytes: int = 0
    min_doc_id: int = 0
    max_doc_id: int = 0
    max_doc_freq: int = 0
    skew_factor: float = 0.0    # max_doc_freq / mean_doc_freq
    # lexicographic term range of the segment's dictionary — lets query
    # paths drop whole segment DIRECTORIES for terms outside the range
    # before any file listing or scan (the manifest-level analogue of the
    # parquet footer min/max the row-group pruning already uses). Empty
    # string = unknown (records written before this field): never prune.
    term_min: str = ""
    term_max: str = ""
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
    def total_qlen(self) -> int:
        return sum(s.total_qlen for s in self.segments)

    @property
    def avgdl(self) -> float:
        """Corpus avgdl under the index's configured convention: raw
        (engine/reference-metapage default) or quantized (the reference SQL
        oracle's convention — Σ decode(encode(dl))/N, matching
        operators/exhaustive.py so index and exhaustive paths agree)."""
        n = self.total_docs
        if not n:
            return 1.0
        if getattr(self.opts, "avgdl_mode", "raw") == "quantized":
            ql = self.total_qlen
            if ql == 0 and self.total_len > 0:
                raise ValueError(
                    "index was written before per-segment quantized length "
                    "sums existed; rebuild it to use avgdl_mode='quantized'")
            return ql / n
        return self.total_len / n

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
        d = self.to_dict()
        seg_pq = os.path.join(self.path, SEGMENTS_PARQUET)
        n_segs = sum(len(v) for v in d["levels"].values())
        stale_sidecar = False
        if n_segs > SEG_PARQUET_THRESHOLD:
            # columnar sidecar, written FIRST; the JSON rename is still the
            # atomic commit point (a reader never sees a v3 manifest whose
            # sidecar is missing)
            self._write_segments_parquet(seg_pq + ".tmp")
            os.replace(seg_pq + ".tmp", seg_pq)
            d["format_version"] = FORMAT_VERSION_PARQUET
            d["levels"] = {}
            d["segments_file"] = SEGMENTS_PARQUET
        else:
            # shrank back below the threshold: the sidecar is deleted AFTER
            # the JSON commit below — unlinking first would leave a window
            # where a crash strands the old v3 manifest pointing at a
            # deleted sidecar (unloadable index)
            stale_sidecar = os.path.exists(seg_pq)
        fd, tmp = tempfile.mkstemp(dir=self.path, suffix=".manifest.tmp")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(d, f, indent=1)
            os.replace(tmp, os.path.join(self.path, MANIFEST_NAME))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        if stale_sidecar:
            try:
                os.unlink(seg_pq)   # best-effort, post-commit
            except OSError:
                pass

    def _write_segments_parquet(self, dest: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        recs = [(lvl, s) for lvl, segs in sorted(self.levels.items())
                for s in segs]
        cols: dict[str, list] = {"level": [l for l, _ in recs]}
        for name in ("segment_id", "num_docs", "total_len", "total_qlen",
                     "num_terms", "num_postings", "bytes", "min_doc_id",
                     "max_doc_id", "max_doc_freq", "skew_factor",
                     "term_min", "term_max"):
            cols[name] = [getattr(s, name) for _, s in recs]
        cols["lineage_json"] = [json.dumps(s.lineage) for _, s in recs]
        pq.write_table(pa.table(cols), dest, compression="zstd")

    @staticmethod
    def _read_segments_parquet(src: str) -> dict[int, list[SegmentRecord]]:
        import pyarrow.parquet as pq
        t = pq.read_table(src)
        cols = {c: t.column(c).to_pylist() for c in t.column_names}
        levels: dict[int, list[SegmentRecord]] = {}
        for i in range(t.num_rows):
            rec = SegmentRecord(
                segment_id=cols["segment_id"][i],
                level=int(cols["level"][i]),
                num_docs=int(cols["num_docs"][i]),
                total_len=int(cols["total_len"][i]),
                total_qlen=int(cols["total_qlen"][i])
                if "total_qlen" in cols else 0,
                num_terms=int(cols["num_terms"][i]),
                num_postings=int(cols["num_postings"][i]),
                bytes=int(cols["bytes"][i]),
                min_doc_id=int(cols["min_doc_id"][i]),
                max_doc_id=int(cols["max_doc_id"][i]),
                max_doc_freq=int(cols["max_doc_freq"][i]),
                skew_factor=float(cols["skew_factor"][i]),
                term_min=str(cols["term_min"][i])
                if "term_min" in cols else "",
                term_max=str(cols["term_max"][i])
                if "term_max" in cols else "",
                lineage=json.loads(cols["lineage_json"][i]),
            )
            levels.setdefault(rec.level, []).append(rec)
        return levels

    @classmethod
    def load(cls, path: str) -> "Manifest":
        with open(os.path.join(path, MANIFEST_NAME)) as f:
            d = json.load(f)
        ver = d.get("format_version", 0)
        if ver not in (FORMAT_VERSION, FORMAT_VERSION_PARQUET):
            raise ValueError(
                f"index at {path} has format_version {ver}; this engine "
                f"reads versions {FORMAT_VERSION}/{FORMAT_VERSION_PARQUET} "
                "— rebuild the index")
        m = cls(path, Bm25Options.from_dict(d["options"]))
        m.created_at = d["created_at"]
        m.updated_at = d["updated_at"]
        m.next_segment = d["next_segment"]
        if d.get("segments_file"):
            m.levels = cls._read_segments_parquet(
                os.path.join(path, d["segments_file"]))
        else:
            m.levels = {int(l): [SegmentRecord.from_dict(s) for s in segs]
                        for l, segs in d["levels"].items()}
        return m

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, MANIFEST_NAME))
