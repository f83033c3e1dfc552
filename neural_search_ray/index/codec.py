"""Posting-list codec: delta + varint compressed docIDs, u32-varint term
frequencies, block-max metadata per fixed-size doc block.

Reference format being re-expressed (NOT copied): per-term postings written
as (docId vint, weight byte)* by sparse/codec/ClusteredPostingTermsWriter.java:155-181
into Lucene .sip files. Here a posting list is one Arrow row
(term, df, docs:binary, tfs:binary, block_max_tf:list<int32>) inside a
partitioned Parquet shard — the Parquet term column's dictionary+stats
play the role of the .sit term dict (SparseTermsLuceneWriter.java:34-98).

All encode/decode paths are numpy-vectorized (no per-posting Python loop):
varint bytes are laid out by computing per-value byte widths, exclusive
offsets, then scattering the 7-bit groups with boolean masks.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 5  # uint32 range


def varint_encode_with_widths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128 varint-encode; also returns per-value byte widths (used by
    the grouped encoder to slice per-group buffers without re-scanning)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # significant-bit count per value (shift loop: exact for full uint64 range)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        mask = tmp > 0
        if not mask.any():
            break
        nbits[mask] += 1
        tmp = tmp >> np.uint64(1)
    widths = np.maximum((nbits + 6) // 7, 1)
    ends = np.cumsum(widths)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - widths
    # scatter 7-bit groups, group g of value i lands at starts[i]+g
    max_w = int(widths.max())
    for g in range(max_w):
        sel = widths > g
        idx = starts[sel] + g
        chunk = (v[sel] >> np.uint64(7 * g)) & np.uint64(0x7F)
        cont = (widths[sel] > g + 1).astype(np.uint8) << 7  # continuation bit
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes(), widths


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128 varint-encode a uint32/int64 array (values must be >= 0)."""
    return varint_encode_with_widths(values)[0]


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 varints → int64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    widths = ends - starts + 1
    vals = np.zeros(ends.size, dtype=np.uint64)
    max_w = int(widths.max())
    for g in range(max_w):
        sel = widths > g
        idx = starts[sel] + g
        vals[sel] |= (b[idx].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * g)
    out = vals.astype(np.int64)
    if count is not None and out.size != count:
        raise ValueError(f"expected {count} varints, decoded {out.size}")
    return out


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128
) -> tuple[bytes, bytes, np.ndarray]:
    """Encode one docID-sorted posting list.

    Returns (docs_delta_varint, tfs_varint, block_max_tf[int32]).
    block_max_tf[i] = max tf within docs [i*block_size, (i+1)*block_size)
    — the block-max metadata used for WAND-style skipping
    (generalizing the reference's per-cluster summary vectors,
    sparse/data/DocumentCluster.java:32-63).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if doc_ids.size == 0:
        return b"", b"", np.empty(0, dtype=np.int32)
    if doc_ids.size > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("posting list must be strictly docID-sorted")
    deltas = np.empty_like(doc_ids)
    deltas[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=deltas[1:])
    docs_buf = varint_encode(deltas)
    tfs_buf = varint_encode(tfs)
    n = doc_ids.size
    nblocks = (n + block_size - 1) // block_size
    pad = nblocks * block_size - n
    padded = np.pad(tfs, (0, pad), constant_values=0)
    block_max = padded.reshape(nblocks, block_size).max(axis=1).astype(np.int32)
    return docs_buf, tfs_buf, block_max


def decode_postings(
    docs_buf: bytes, tfs_buf: bytes, df: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Decode (docs_delta_varint, tfs_varint) → (doc_ids int64, tfs int64)."""
    deltas = varint_decode(docs_buf, df)
    doc_ids = np.cumsum(deltas)
    tfs = varint_decode(tfs_buf, df)
    return doc_ids, tfs
