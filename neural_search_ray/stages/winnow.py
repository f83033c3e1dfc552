"""Vectorized rolling-hash (Karp-Rabin) winnowing fingerprint.

The scale-grade companion to the md5 winnow entry (pipelines/suite.py
q_fingerprint_winnow, whose per-window md5 loop is pinned by its DuckDB
``md5_number_lower`` oracle and cannot vectorize): here the window hash is
a degree-31 polynomial over Unicode code points

    h(w) = sum_{j=0}^{W-1} code(w[j]) * B^(W-1-j)   (mod 2^64)

evaluated for EVERY window of the whole batch in W numpy passes
(``acc = acc*B + codes[starts+j]``, uint64 wrap = mod 2^64), then min-reduced
per document (``np.minimum.reduceat``). No per-row Python in the long-doc
path. The same polynomial is SQL-expressible with DuckDB HUGEINT
(list_reduce over the window slice, % 2^64), so the operator carries a full
value oracle — see suite.py q_fingerprint_winnow_roll.

Scheme (classic winnowing, Schleimer/Wilkerson/Aiken SIGMOD'03 shape):
windows of W=32 code points at stride 16; documents shorter than W hash the
whole text as one window; the fingerprint is the minimum window hash, masked
to 63 bits for BIGINT transport.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WINNOW_B = np.uint64(131)
WINNOW_W = 32
WINNOW_STRIDE = 16
_MASK63 = np.uint64(0x7FFF_FFFF_FFFF_FFFF)


def _codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated code-point array + per-doc offsets (one C-level
    utf-32 encode for the whole batch, not per row)."""
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    joined = "".join(texts)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    return codes, offsets


def winnow_roll_batch(texts: list[str]) -> np.ndarray:
    """Per-doc rolling-hash winnow fingerprint (int64, 63-bit)."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    texts = [t or "" for t in texts]
    codes, offsets = _codepoints(texts)
    lens = np.diff(offsets)
    out = np.zeros(n, dtype=np.uint64)

    long = np.nonzero(lens >= WINNOW_W)[0]
    if long.size:
        llens = lens[long]
        nwin = (llens - WINNOW_W) // WINNOW_STRIDE + 1
        # all window start positions for all long docs, no Python loop:
        # repeat each doc's first start, then add 0,16,32,... within doc
        win_doc_off = np.concatenate(([0], np.cumsum(nwin)))
        total = int(win_doc_off[-1])
        starts = np.repeat(offsets[long], nwin) + (
            np.arange(total, dtype=np.int64) - np.repeat(win_doc_off[:-1], nwin)
        ) * WINNOW_STRIDE
        acc = np.zeros(total, dtype=np.uint64)
        for j in range(WINNOW_W):  # W vectorized passes over every window
            acc = acc * WINNOW_B + codes[starts + j]
        out[long] = np.minimum.reduceat(acc, win_doc_off[:-1])

    short = np.nonzero(lens < WINNOW_W)[0]
    if short.size:
        # whole-text hash; ≤ W-1 vectorized passes, masked by remaining length
        acc = np.zeros(short.size, dtype=np.uint64)
        soff = offsets[short]
        slen = lens[short]
        for j in range(int(slen.max()) if slen.size else 0):
            active = slen > j
            acc[active] = acc[active] * WINNOW_B + codes[soff[active] + j]
        out[short] = acc

    return (out & _MASK63).astype(np.int64)


def winnow_roll_stage(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """map_batches callable form."""
    fps = winnow_roll_batch(batch[text_col].to_pylist())
    return pa.table({id_col: batch[id_col], "winnow_fp": pa.array(fps)})


def winnow_roll_scalar(text: str) -> int:
    """Plain-Python reference implementation (tests only)."""
    text = text or ""
    B, W, S, M = 131, WINNOW_W, WINNOW_STRIDE, 1 << 64

    def h(seg: str) -> int:
        acc = 0
        for ch in seg:
            acc = (acc * B + ord(ch)) % M
        return acc

    if len(text) < W:
        best = h(text)
    else:
        best = min(h(text[i : i + W]) for i in range(0, len(text) - W + 1, S))
    return best % (1 << 63)
