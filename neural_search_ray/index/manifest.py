"""Index manifest: per-partition lineage + metrics, the checkpoint/resume unit.

Mirrors the reference's segment model (immutable segment files + commit
points, SURVEY.md §2.11/§4): each *segment* (an independently-built slice
of the input) records its input fragments, per-(doc_shard, term_bucket)
output files with row counts, doc/token counts, and global-stats partials.
Resume = skip segments whose manifest entry is complete; global stats are
re-derived from segment partials (cheap, scalar-sized).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"
DOCLEN_BUCKET = -1  # sentinel bucket id for doc-length "posting" files


@dataclass
class GroupFile:
    doc_shard: int
    term_bucket: int
    path: str           # relative to index_dir
    n_terms: int
    n_postings: int


@dataclass
class SegmentManifest:
    segment_id: str
    input_files: list[str]
    n_docs: int
    sum_dl: int
    files: list[dict] = field(default_factory=list)   # GroupFile dicts
    complete: bool = False


@dataclass
class IndexManifest:
    num_doc_shards: int
    num_term_buckets: int
    block_size: int
    analyzer: dict
    bm25: dict
    weight_quantization: str = "none"  # "none" | "u8" (quantized sparse tier)
    posting_codec: str = "varint"      # "varint" | "for" (index/codec.py)
    segments: dict[str, Any] = field(default_factory=dict)  # id → SegmentManifest dict

    # -- global stats over complete segments --
    @property
    def n_docs(self) -> int:
        return sum(s["n_docs"] for s in self.segments.values() if s["complete"])

    @property
    def avgdl(self) -> float:
        n = self.n_docs
        if n == 0:
            return 0.0
        return sum(s["sum_dl"] for s in self.segments.values() if s["complete"]) / n

    def complete_segments(self) -> list[dict]:
        return [s for s in self.segments.values() if s["complete"]]

    def save(self, index_dir: str) -> None:
        tmp = os.path.join(index_dir, MANIFEST_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f, indent=1)
        os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))

    @classmethod
    def load(cls, index_dir: str) -> "IndexManifest | None":
        path = os.path.join(index_dir, MANIFEST_NAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            d = json.load(f)
        return cls(
            num_doc_shards=d["num_doc_shards"],
            num_term_buckets=d["num_term_buckets"],
            block_size=d["block_size"],
            analyzer=d["analyzer"],
            bm25=d["bm25"],
            weight_quantization=d.get("weight_quantization", "none"),
            posting_codec=d.get("posting_codec", "varint"),
            segments=d["segments"],
        )
