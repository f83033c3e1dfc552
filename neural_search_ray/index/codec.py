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


# ---- bit-packed frame-of-reference codec (PForDelta family) ---------------
# Per posting list: [LEB128 varint count][one width byte per 128-value
# block][blocks back-to-back, each ceil(n_block*width/8) bytes, little-
# endian bit order]. Width = bit length of the block max, so a hot term
# whose docID deltas fit 3 bits costs 3 bits/posting vs varint's 8 — and
# decode is a byte-gather + shift per width class instead of a
# continuation-bit scan. The varint count keeps the Zipf tail cheap (a
# df=1 row pays 2 header bytes, not 5). (Plain FOR without exceptions:
# the 128-value block granularity already isolates outliers; Zukowski et
# al. "Super-Scalar RAM-CPU Cache Compression", ICDE'06.)

_FOR_BLOCK = 128


def _leb(n: int) -> bytes:
    """Scalar LEB128 (same wire format as varint_encode for one value)."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _unleb(buf, pos: int = 0) -> tuple[int, int]:
    """Parse one LEB128 value; returns (value, next position)."""
    val = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not (b & 0x80):
            return val, pos
        shift += 7


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact per-element bit length of a uint64 array (no float log)."""
    bl = np.zeros(v.shape, dtype=np.int64)
    rem = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = rem >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        rem[m] >>= np.uint64(s)
    return bl + (rem > 0)


def grouped_for_encode(
    flat: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """FOR-encode many groups in one vectorized pass (the per-term rows of
    a write-group table); blocks never cross group boundaries."""
    v = np.asarray(flat, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    nrows = starts.size
    lens = ends - starts
    nblocks_row = (lens + _FOR_BLOCK - 1) // _FOR_BLOCK
    NB = int(nblocks_row.sum())
    first_block = np.cumsum(nblocks_row) - nblocks_row
    if NB == 0:
        return [_leb(0)] * nrows
    # segmented arange: global block b belongs to row brow[b] and starts at
    # starts[brow] + 128*(index within row)
    brow = np.repeat(np.arange(nrows, dtype=np.int64), nblocks_row)
    within = np.arange(NB, dtype=np.int64) - first_block[brow]
    bstart = starts[brow] + _FOR_BLOCK * within
    bn = np.minimum(bstart + _FOR_BLOCK, ends[brow]) - bstart
    # pad-gather blocks into a (NB, 128) matrix
    lane = np.arange(_FOR_BLOCK, dtype=np.int64)
    idx = bstart[:, None] + lane
    valid = lane[None, :] < bn[:, None]
    mat = np.zeros((NB, _FOR_BLOCK), dtype=np.uint64)
    mat[valid] = v[idx[valid]]
    widths = _bit_length(mat.max(axis=1))
    sizes = (bn * widths + 7) // 8
    d_off = np.concatenate(([0], np.cumsum(sizes)))
    data = np.zeros(int(d_off[-1]), dtype=np.uint8)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        ms = mat[sel]
        # bit-plane loop with uint8 planes (a (k,128,w) uint64 broadcast
        # temp is 8x the memory traffic and stalls on big inputs)
        bits = np.empty((sel.size, _FOR_BLOCK, w), dtype=np.uint8)
        for g in range(w):
            bits[:, :, g] = ((ms >> np.uint64(g)) & np.uint64(1)).astype(np.uint8)
        packed = np.packbits(
            bits.reshape(sel.size, _FOR_BLOCK * w), axis=1, bitorder="little"
        )
        span = np.arange(packed.shape[1], dtype=np.int64)
        didx = d_off[sel][:, None] + span
        keep = span[None, :] < sizes[sel][:, None]
        data[didx[keep]] = packed[keep]
    datab = data.tobytes()
    wbytes = widths.astype(np.uint8).tobytes()
    out = []
    for r in range(nrows):
        fb = int(first_block[r])
        nbk = int(nblocks_row[r])
        out.append(
            _leb(int(lens[r]))
            + wbytes[fb : fb + nbk]
            + datab[int(d_off[fb]) : int(d_off[fb + nbk])]
        )
    return out


def for_encode(values: np.ndarray) -> bytes:
    """FOR-encode one non-negative int array (single-group convenience)."""
    v = np.asarray(values, dtype=np.uint64)
    return grouped_for_encode(
        v, np.asarray([0], dtype=np.int64), np.asarray([v.size], dtype=np.int64)
    )[0]


def for_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode one FOR buffer → int64 array (vectorized per width class)."""
    n, hdr = _unleb(buf)
    if count is not None and n != count:
        raise ValueError(f"expected {count} values, header says {n}")
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nb = (n + _FOR_BLOCK - 1) // _FOR_BLOCK
    raw = np.frombuffer(buf, dtype=np.uint8)
    widths = raw[hdr : hdr + nb].astype(np.int64)
    nvals = np.full(nb, _FOR_BLOCK, dtype=np.int64)
    nvals[-1] = n - (nb - 1) * _FOR_BLOCK
    sizes = (nvals * widths + 7) // 8
    d_off = np.concatenate(([0], np.cumsum(sizes)))
    data = raw[hdr + nb :]
    out = np.zeros(nb * _FOR_BLOCK, dtype=np.uint64)
    lane = np.arange(_FOR_BLOCK, dtype=np.int64)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(widths == w)
        maxb = _FOR_BLOCK * w // 8
        span = np.arange(maxb, dtype=np.int64)
        gidx = d_off[sel][:, None] + span
        keep = span[None, :] < sizes[sel][:, None]
        gb = np.zeros((sel.size, maxb + 8), dtype=np.uint8)  # +8: gather pad
        gb[:, :maxb][keep] = data[gidx[keep]]
        if w <= 57:
            # byte-gather: lane l's bits live at [l*w, l*w + w) — read the
            # <= 8-byte window covering them into a uint64, shift, mask
            # (touches (w+6)//8+1 bytes/value vs unpackbits' w bytes/value)
            byte0 = (lane * w) >> 3
            shift = ((lane * w) & 7).astype(np.uint64)
            nwin = (w + 6) // 8 + 1
            acc = np.zeros((sel.size, _FOR_BLOCK), dtype=np.uint64)
            for g in range(nwin):
                acc |= gb[:, byte0 + g].astype(np.uint64) << np.uint64(8 * g)
            vals = (acc >> shift) & np.uint64((1 << w) - 1)
        else:
            bits = np.unpackbits(
                gb[:, :maxb], axis=1, bitorder="little"
            ).reshape(sel.size, _FOR_BLOCK, w)
            vals = (bits.astype(np.uint64) << np.arange(w, dtype=np.uint64)).sum(
                axis=2, dtype=np.uint64
            )
        out[(sel[:, None] * _FOR_BLOCK + lane).ravel()] = vals.ravel()
    return out[:n].astype(np.int64)


# ---- positional payloads ---------------------------------------------------
# A positional posting list stores, per posting (term, doc), its within-doc
# token positions (the Lucene .prx / FieldsConsumer positions stream that
# backs PhraseQuery — the reference inherits it from Lucene text fields).
# Layout: ONE buffer per term row = the per-posting position DELTAS
# (first position absolute, then successive gaps), concatenated in posting
# order and codec-encoded like any other stream; the posting's tf is its
# position count, so decode needs no extra offsets. Helpers below are the
# shared vectorized kernels for build (index/build.py), merge
# (index/merge.py) and query decode (query/engine.py).


def posting_gather(
    posting_starts: np.ndarray, tf: np.ndarray, order: np.ndarray
) -> np.ndarray:
    """Token-level gather index that reorders a posting-contiguous flat
    array (positions) when postings are permuted/selected by ``order``.

    ``posting_starts[i]``/``tf[i]`` describe posting i's slice of the flat
    array; ``order`` is any int index array (permutation or subset)."""
    new_tf = tf[order]
    total = int(new_tf.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    new_starts = np.cumsum(new_tf) - new_tf
    return (
        np.repeat(posting_starts[order] - new_starts, new_tf)
        + np.arange(total, dtype=np.int64)
    )


def positions_delta(flat_pos: np.ndarray, posting_starts: np.ndarray) -> np.ndarray:
    """Per-posting delta encode: first position absolute, then gaps."""
    deltas = np.empty_like(flat_pos)
    if flat_pos.size:
        deltas[0] = flat_pos[0]
        np.subtract(flat_pos[1:], flat_pos[:-1], out=deltas[1:])
        deltas[posting_starts] = flat_pos[posting_starts]
    return deltas


def positions_undelta(
    deltas: np.ndarray, posting_starts: np.ndarray, tf: np.ndarray
) -> np.ndarray:
    """Inverse of positions_delta (segmented cumsum, vectorized)."""
    if deltas.size == 0:
        return deltas.astype(np.int64, copy=False)
    c = np.cumsum(deltas)
    base = c[posting_starts] - deltas[posting_starts]
    return c - np.repeat(base, tf)


def decoder_for(codec: str):
    """Posting-buffer decoder for a manifest's posting_codec."""
    if codec == "for":
        return for_decode
    if codec == "varint":
        return varint_decode
    raise ValueError(f"unknown posting codec {codec!r}")


def grouped_varint_encode(
    flat: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> list[bytes]:
    """varint-encode many groups in ONE vectorized pass, slice per group."""
    buf, widths = varint_encode_with_widths(flat)
    if not len(buf):
        return [b""] * len(starts)
    bends = np.cumsum(widths)
    bstarts = np.concatenate(([0], bends[:-1]))
    return [
        buf[int(bstarts[s]) : int(bends[e - 1])] if e > s else b""
        for s, e in zip(starts, ends)
    ]


def grouped_encoder_for(codec: str):
    """Grouped (flat, starts, ends) → list[bytes] encoder per codec."""
    if codec == "for":
        return grouped_for_encode
    if codec == "varint":
        return grouped_varint_encode
    raise ValueError(f"unknown posting codec {codec!r}")


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
