"""significant_terms aggregation (JLH heuristic).

Reference parity: OpenSearch's SignificantTermsAggregator with the
default JLH significance heuristic (SignificantTermsAggregatorFactory /
JLHScore.java): terms whose frequency in the *foreground* set (the
query's match set) is anomalously high versus the *background* set (the
whole collection), scored

    score = (fg_pct − bg_pct) · (fg_pct / bg_pct)
    fg_pct = fg_df / |matches|,   bg_pct = bg_df / n_docs

and only terms with fg_pct > bg_pct qualify (JLHScore.java's
``absoluteProbabilityChange > 0`` gate).

Ray-Data-native shape: foreground doc-frequencies come from the FORWARD
index (one CSR row gather per match doc — the analogue of OpenSearch's
significant_text re-analysis, but without re-tokenizing), background
frequencies from the term dictionary's stored df. Shard partials are
(term, fg_df) maps bounded by vocabulary, merged by sum at the
coordinator — the same distributive merge as facet_terms, so a
shard-subset actor pool serves this exactly.

Float-tie discipline: scores are rounded half-up to 6 decimals BEFORE
ranking on both the engine and SQL-oracle sides (same trick as
more_like_this — the expression is float-op-identical, but the ranking
key must not depend on sub-rounding noise).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

__all__ = ["significant_terms"]


def _round_half_up6(x: np.ndarray) -> np.ndarray:
    f = 1e6
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x * f + 0.5), np.ceil(x * f - 0.5)) / f


def significant_terms(
    searcher,
    terms: list[str],
    size: int = 10,
    min_doc_count: int = 1,
):
    """Top ``size`` significant terms of the boolean-OR match set of
    ``terms``, by (JLH score desc, term asc).

    Returns (terms list[str], scores, fg_df, bg_df) aligned arrays.
    Requires the forward index (index/forward.py build_forward_index).
    """
    from ..index.forward import ShardForward

    docs = searcher._match_union(terms)
    empty = (
        [],
        np.empty(0, np.float64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
    )
    if docs.size == 0:
        return empty
    fg_count = float(docs.size)

    fg: dict[str, int] = defaultdict(int)
    for shard in sorted(searcher.shards):
        fwd = ShardForward(searcher.index_dir, shard)
        sel = np.flatnonzero(np.isin(fwd.doc_ids, docs))
        if sel.size == 0:
            continue
        pos, _, _ = fwd.row_slices(sel)
        # one CSR row per doc holds each term once → unique-count = df
        tids, counts = np.unique(fwd.flat_tids[pos], return_counts=True)
        for tid, c in zip(tids.tolist(), counts.tolist()):
            fg[fwd.terms[tid]] += int(c)

    if not fg:
        return empty
    vocab = sorted(fg)
    fg_df = np.asarray([fg[t] for t in vocab], dtype=np.int64)
    bg_df = np.asarray(
        [searcher.local_df(t) for t in vocab], dtype=np.int64
    )
    n_docs = float(searcher.n_docs)
    fp = fg_df / fg_count
    bp = bg_df / n_docs
    # float-op order mirrors the SQL oracle exactly
    score = (fp - bp) * (fp / bp)
    keep = (fp > bp) & (fg_df >= min_doc_count)
    if not keep.any():
        return empty
    vocab_arr = np.asarray(vocab, dtype=object)[keep]
    score = _round_half_up6(score[keep])
    fg_df, bg_df = fg_df[keep], bg_df[keep]
    order = np.lexsort((vocab_arr, -score))[:size]
    return (
        vocab_arr[order].tolist(),
        score[order],
        fg_df[order],
        bg_df[order],
    )
