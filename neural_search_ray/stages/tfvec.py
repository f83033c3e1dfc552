"""Vectorized per-batch (doc_id, term, tf) extraction and segmented
sparse-vector pruning — the suite/ingest hot-path kernels.

Same kernel shape as the index build (index/build.py:123-151):
``analyze_column`` (Arrow C++ fast path) → ``dictionary_encode`` →
``np.unique`` over paired (doc, code) keys — no per-row Python tokenize
loop, no per-term dict building. The prune strategies are applied over
doc SEGMENTS of the flat arrays with lexsort/cumsum (semantics identical
to stages/prune.py, which remains the scalar reference; PruneUtils.java:
34-201).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.analyzer import analyze_column
from ..config import AnalyzerConfig


def doc_term_tf(
    batch: pa.Table,
    analyzer_cfg: AnalyzerConfig = AnalyzerConfig(),
    id_column: str = "doc_id",
    text_column: str = "text",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """One batch → flat (doc_idx, code, tf) rows sorted by (doc, code),
    plus the term dictionary. doc_idx indexes into batch rows."""
    n_docs = batch.num_rows
    text_col = batch[text_column]
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    tok_lists = analyze_column(text_col, analyzer_cfg)
    offs = tok_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    flat = tok_lists.flatten()
    if not len(flat):
        e = np.empty(0, np.int64)
        return e, e, e, pa.array([], type=pa.string())
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = denc.dictionary.cast(pa.string())
    n_uniq = len(uniques)
    tok_doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    pair = tok_doc_idx * n_uniq + codes
    upair, tf = np.unique(pair, return_counts=True)
    return upair // n_uniq, upair % n_uniq, tf.astype(np.int64), uniques


def tf_rows_stage(
    analyzer_cfg: AnalyzerConfig = AnalyzerConfig(),
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """map_batches fn: (doc_id, text) → (doc_id, term, tf) rows."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_idx, codes, tf, uniques = doc_term_tf(
            batch, analyzer_cfg, id_column, text_column
        )
        doc_ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_idx] if doc_idx.size else doc_idx),
                "term": uniques.take(pa.array(codes)),
                "tf": pa.array(tf),
            }
        )

    return fn


def term_stats_partial_stage(
    analyzer_cfg: AnalyzerConfig = AnalyzerConfig(),
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """map_batches fn: (doc_id, text) → per-BATCH (term, df, cf) partials
    — the combiner that keeps the final groupby("term") skew-free: a
    stopword contributes one row per block, not one per doc."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_idx, codes, tf, uniques = doc_term_tf(
            batch, analyzer_cfg, id_column, text_column
        )
        if not codes.size:
            return pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "df": pa.array([], type=pa.int64()),
                    "cf": pa.array([], type=pa.int64()),
                }
            )
        order = np.argsort(codes, kind="stable")
        c = codes[order]
        t = tf[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(c) != 0) + 1))
        ends = np.concatenate((starts[1:], [c.size]))
        return pa.table(
            {
                "term": uniques.take(pa.array(c[starts])),
                "df": pa.array(ends - starts),
                "cf": pa.array(np.add.reduceat(t, starts)),
            }
        )

    return fn


def _segment_prune_mask(
    doc_idx: np.ndarray,
    rank_by_code: np.ndarray,
    codes: np.ndarray,
    w: np.ndarray,
    prune_type: str,
    ratio: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized prune over per-doc segments. Input rows are grouped by
    doc (any within-doc order); returns (order, keep_mask) where order
    re-sorts rows by (doc, weight desc, term asc) and keep_mask selects
    the kept rows of the ordered view. Semantics == stages/prune.py."""
    order = np.lexsort((rank_by_code[codes], -w, doc_idx))
    d = doc_idx[order]
    ws = w[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(d) != 0) + 1))
    seg_id = np.cumsum(np.concatenate(([0], (np.diff(d) != 0).astype(np.int64))))
    pos_in_seg = np.arange(d.size) - starts[seg_id]
    if prune_type == "top_k":
        keep = pos_in_seg < int(ratio)
    elif prune_type == "max_ratio":
        seg_max = ws[starts][seg_id]  # first of each desc-sorted segment
        keep = ws >= ratio * seg_max
    elif prune_type == "abs_value":
        keep = ws >= ratio
    elif prune_type == "alpha_mass":
        cums = np.cumsum(ws)
        seg_before = np.concatenate(([0.0], cums))[starts][seg_id]
        ends = np.concatenate((starts[1:], [d.size]))
        seg_total = np.concatenate(([0.0], cums))[ends][seg_id] - seg_before
        keep = (cums - seg_before) <= ratio * seg_total
    else:
        raise ValueError(f"unknown prune type {prune_type!r}")
    return order, keep


def make_prune_tf_stage(
    prune_type: str,
    ratio: float,
    analyzer_cfg: AnalyzerConfig = AnalyzerConfig(),
    id_column: str = "doc_id",
    text_column: str = "text",
):
    """map_batches fn: (doc_id, text) → pruned (doc_id, term, tf) rows,
    fully vectorized (tokenize kernel + segmented prune)."""

    def fn(batch: pa.Table) -> pa.Table:
        doc_idx, codes, tf, uniques = doc_term_tf(
            batch, analyzer_cfg, id_column, text_column
        )
        doc_ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        if not codes.size:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "term": pa.array([], type=pa.string()),
                    "tf": pa.array([], type=pa.int64()),
                }
            )
        # lexicographic rank of each dictionary code (tie-break: term asc)
        sort_idx = pc.sort_indices(uniques).to_numpy(zero_copy_only=False)
        rank_by_code = np.empty(len(uniques), dtype=np.int64)
        rank_by_code[sort_idx] = np.arange(len(uniques))
        order, keep = _segment_prune_mask(
            doc_idx, rank_by_code, codes, tf.astype(np.float64), prune_type, ratio
        )
        sel = order[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[doc_idx[sel]]),
                "term": uniques.take(pa.array(codes[sel])),
                "tf": pa.array(tf[sel]),
            }
        )

    return fn
