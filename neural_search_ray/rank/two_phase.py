"""Two-phase sparse query: phase 1 retrieves a candidate window with the
HIGH-weight query tokens only; phase 2 rescores the window with the full
query.

Re-specified from processor/NeuralSparseTwoPhaseProcessor.java:44-180 and
the split at query/NeuralSparseQueryBuilder.java:545-557: query tokens are
split by a prune strategy (default max_ratio 0.4); the phase-1 window is
``min(max(k * expansion_rate, k), max_window_size)`` (defaults 5.0×,
10000). Phase-2 adds the LOW-token contributions to the phase-1 scores of
the window docs (a rescorer over the expanded window), then final top-k.
"""

from __future__ import annotations

import numpy as np

from ..stages.prune import split_sparse_vector

DEFAULT_EXPANSION_RATE = 5.0
DEFAULT_MAX_WINDOW_SIZE = 10000
DEFAULT_PRUNE_TYPE = "max_ratio"
DEFAULT_PRUNE_RATIO = 0.4


def two_phase_search(
    searcher,
    token_weights: dict[str, float],
    k: int = 10,
    prune_type: str = DEFAULT_PRUNE_TYPE,
    prune_ratio: float = DEFAULT_PRUNE_RATIO,
    expansion_rate: float = DEFAULT_EXPANSION_RATE,
    max_window_size: int = DEFAULT_MAX_WINDOW_SIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Two-phase sparse dot-product top-k against an IndexSearcher."""
    high, low = split_sparse_vector(prune_type, prune_ratio, token_weights)
    window = int(min(max(k * expansion_rate, k), max_window_size))
    if not high:  # nothing survived pruning: single-phase
        return searcher.search_sparse_dot(token_weights, k)
    docs1, scores1 = searcher.search_sparse_dot(high, window)
    if docs1.size == 0 or not low:
        order = np.lexsort((docs1, -scores1))[:k]
        return docs1[order], scores1[order]
    # phase 2: add low-token contributions for window docs only
    low_docs, low_scores = searcher.search_sparse_dot(low, searcher.n_docs or 1)
    lorder = np.argsort(low_docs, kind="stable")  # top-k output is score-ordered
    low_docs, low_scores = low_docs[lorder], low_scores[lorder]
    pos = np.searchsorted(low_docs, docs1)
    pos_clipped = np.clip(pos, 0, max(low_docs.size - 1, 0))
    match = (
        (low_docs.size > 0)
        & (pos < low_docs.size)
        & (low_docs[pos_clipped] == docs1)
    )
    add = np.where(match, low_scores[pos_clipped], 0.0)
    final = scores1 + add
    order = np.lexsort((docs1, -final))[:k]
    return docs1[order], final[order]
