"""CJKBigramFilter (Lucene analysis-cjk) — Han-run bigram expansion.

Pinned semantics (documented deviation from Lucene's flag soup): a
token consisting of CJK Unified Ideographs (U+4E00-U+9FFF) of length
n >= 2 expands to its n-1 overlapping character bigrams; a single
ideograph stays a unigram; non-CJK tokens pass through unchanged.
(Lucene emits the same stream for its default han=true configuration
when the tokenizer hands it one ideograph per token; our standard
tokenizer yields whole Han runs, so the bigram window runs inside the
token.)

The flat-array form is regex-gated like the asciifolding filter: one
Arrow match pass finds CJK tokens, only those expand, and the
reassembly is a single vectorized gather over [kept ++ expanded].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["expand_cjk_bigrams_tokens", "expand_cjk_bigrams_lists"]

_CJK_RE = "^[一-鿿]+$"


def _bigrams(tok: str) -> list[str]:
    if len(tok) <= 1:
        return [tok]
    return [tok[i : i + 2] for i in range(len(tok) - 1)]


def expand_cjk_bigrams_tokens(tokens: list[str]) -> list[str]:
    out: list[str] = []
    for t in tokens:
        if t and "一" <= t[0] <= "鿿" and all(
            "一" <= c <= "鿿" for c in t
        ):
            out.extend(_bigrams(t))
        else:
            out.append(t)
    return out


def expand_cjk_bigrams_lists(lists: pa.ListArray) -> pa.ListArray:
    """Expand CJK tokens to bigrams inside a list<string> column,
    preserving per-row boundaries.  Non-CJK batches return unchanged
    after one Arrow regex pass."""
    flat = lists.flatten()
    mask = pc.match_substring_regex(flat, _CJK_RE)
    mask_np = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
    if not mask_np.any():
        return lists
    idx = np.flatnonzero(mask_np)
    cjk_tokens = flat.take(pa.array(idx)).to_pylist()
    pieces: list[str] = []
    piece_counts = np.empty(len(idx), dtype=np.int64)
    for k, t in enumerate(cjk_tokens):
        bs = _bigrams(t)
        piece_counts[k] = len(bs)
        pieces.extend(bs)
    # per-token output length: 1 for pass-through, n-1 (or 1) for CJK
    out_per_tok = np.ones(len(flat), dtype=np.int64)
    out_per_tok[idx] = piece_counts
    # gather positions: pass-through tokens from `flat`, expanded from
    # `pieces` (appended after), in original token order
    piece_start = np.zeros(len(flat), dtype=np.int64)
    piece_start[idx] = len(flat) + np.concatenate(
        [[0], np.cumsum(piece_counts)[:-1]]
    )
    keep_start = np.arange(len(flat), dtype=np.int64)
    starts = np.where(mask_np, piece_start, keep_start)
    total = int(out_per_tok.sum())
    gather = np.repeat(starts, out_per_tok) + (
        np.arange(total)
        - np.repeat(np.cumsum(out_per_tok) - out_per_tok, out_per_tok)
    )
    combined = pa.concat_arrays(
        [flat.cast(pa.string()), pa.array(pieces, pa.string())]
    )
    new_flat = combined.take(pa.array(gather))
    # new offsets: cumulative output tokens at each old row boundary
    old_off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    old_off = old_off - old_off[0]
    cum = np.concatenate([[0], np.cumsum(out_per_tok)])
    new_off = cum[old_off]
    return pa.ListArray.from_arrays(
        pa.array(new_off, type=pa.int64()), new_flat
    )
