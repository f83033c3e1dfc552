"""Bloom-filter membership for incremental corpus dedup.

The 100-TB web-crawl primitive the batch dedup family doesn't cover:
"have we already ingested this document in a PREVIOUS crawl?" —
answered without joining against the old corpus.  Build a Bloom filter
over corpus A's content fingerprints (streaming, mergeable partials),
broadcast the packed bitmap once via ``ray.put`` (m/8 bytes — ~128 KiB
for m = 2^20), and flag corpus B's rows whose k hash positions are all
set.  False positives are possible (classic Bloom semantics) but the
filter is fully DETERMINISTIC: positions come from the exact
Mersenne-61 universal hash family already mirrored in SQL by the
minhash oracle chain, so an oracle can replay membership bit-for-bit
(the FP set is identical on both sides).

Scale shape: the build pass emits per-batch DISTINCT bit positions
(bounded by m, usually far fewer), ONE groupby(pos) exchange dedups
them, and the driver packs the bounded position list into a numpy
bitmap; the probe pass is a stateless ``map_batches`` against the
broadcast bitmap — no shuffle touches corpus B.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import h64_batch, universal_hash

__all__ = ["BLOOM_HASHES", "bloom_positions", "build_bloom", "bloom_flag_stage"]

# pinned (a, b) pairs for the k universal hash functions (a < 2^31)
BLOOM_HASHES: tuple[tuple[int, int], ...] = (
    (1103515245, 12345),
    (1588635695, 374761393),
    (741103597, 668265263),
)

_MASK63 = np.uint64((1 << 63) - 1)


def bloom_positions(texts: list[str], m: int) -> np.ndarray:
    """(n, k) bit positions for each text's md5-based fingerprint."""
    h = h64_batch(texts).astype(np.uint64) & _MASK63
    cols = [
        (universal_hash(h, a, b) % np.uint64(m)).astype(np.int64)
        for a, b in BLOOM_HASHES
    ]
    return np.stack(cols, axis=1)


def build_bloom(ds, m: int, text_col: str = "text") -> np.ndarray:
    """Streaming Bloom build over a (…, text) Dataset: per-batch
    DISTINCT positions -> ONE groupby(pos) exchange -> packed uint8
    bitmap of m bits (driver materializes at most m rows)."""
    import ray
    from ray.data.aggregate import Count

    def partial(batch: pa.Table) -> pa.Table:
        pos = bloom_positions(
            batch[text_col].to_pylist(), m
        ).ravel()
        return pa.table({"pos": pa.array(np.unique(pos), pa.int64())})

    distinct = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("pos")
        .aggregate(Count(alias_name="c"))
    )
    rows = distinct.take_all()  # bounded by m
    bitmap = np.zeros(m, dtype=bool)
    if rows:
        bitmap[np.array([r["pos"] for r in rows], np.int64)] = True
    return np.packbits(bitmap)


def bloom_flag_stage(bitmap_ref, m: int, text_col: str = "text"):
    """map_batches fn factory: flag rows whose k positions are ALL set
    in the broadcast bitmap (1 = seen-before candidate, incl. the
    deterministic false positives)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        packed = ray.get(bitmap_ref)
        bits = np.unpackbits(packed)[:m].astype(bool)
        pos = bloom_positions(batch[text_col].to_pylist(), m)
        hit = bits[pos].all(axis=1)
        return pa.table({
            "doc_id": batch["doc_id"],
            "seen_before": pa.array(hit.astype(np.int64), pa.int64()),
        })

    return fn
