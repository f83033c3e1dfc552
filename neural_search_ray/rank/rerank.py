"""Rerank processors: by_field, ml-similarity (stub model), and MMR.

- by_field (processor/rerank/ByFieldRerankProcessor.java:72-160):
  replace each hit's score with a numeric target field of the doc,
  optionally keeping the previous score; re-sort desc.
- rescoring rerank (processor/rerank/RescoringRerankProcessor.java:49-80,
  MLOpenSearchRerankProcessor.java:26-100): rescore top hits with a
  similarity model — here any callable (query_text, doc_texts) →
  scores; a deterministic token-overlap scorer stands in for the
  cross-encoder (no model weights in this environment).
- MMR (processor/mmr/MMRNeuralQueryTransformer.java:40-170): greedy
  maximal-marginal-relevance diversity re-selection over candidate
  vectors: argmax_d [ λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) ].
"""

from __future__ import annotations

import numpy as np


def rerank_by_field(
    doc_ids: np.ndarray,
    scores: np.ndarray,
    field_values: np.ndarray,
    keep_previous_score: bool = False,
):
    """Returns (doc_ids, new_scores[, previous_scores]) sorted by
    (field value desc, doc_id asc)."""
    fv = np.asarray(field_values, dtype=np.float64)
    order = np.lexsort((doc_ids, -fv))
    if keep_previous_score:
        return doc_ids[order], fv[order], np.asarray(scores)[order]
    return doc_ids[order], fv[order]


def token_overlap_similarity(query_text: str, doc_texts: list[str]) -> np.ndarray:
    """Deterministic stand-in for the cross-encoder similarity model:
    |tokens(q) ∩ tokens(d)| / |tokens(q) ∪ tokens(d)|."""
    from ..analysis.analyzer import tokenize

    q = set(tokenize(query_text))
    out = np.zeros(len(doc_texts))
    for i, d in enumerate(doc_texts):
        t = set(tokenize(d or ""))
        union = len(q | t)
        out[i] = len(q & t) / union if union else 0.0
    return out


def rerank_rescore(
    query_text: str,
    doc_ids: np.ndarray,
    doc_texts: list[str],
    similarity_fn=token_overlap_similarity,
):
    """Rescore hits with a similarity function, re-sort (score desc, doc asc)."""
    scores = np.asarray(similarity_fn(query_text, doc_texts), dtype=np.float64)
    order = np.lexsort((doc_ids, -scores))
    return doc_ids[order], scores[order]


def mmr_select(
    relevance: np.ndarray,
    vectors: np.ndarray,
    k: int,
    lambda_: float = 0.5,
) -> np.ndarray:
    """Greedy MMR: indexes of selected candidates in selection order.

    relevance: (n,) raw relevance scores; vectors: (n, d) candidate
    embeddings (cosine similarity space).
    """
    n = relevance.size
    k = min(k, n)
    if k == 0:
        return np.empty(0, dtype=np.int64)
    norms = np.linalg.norm(vectors, axis=1)
    norms[norms == 0] = 1.0
    unit = vectors / norms[:, None]
    sim = unit @ unit.T
    selected = [int(np.argmax(relevance))]
    remaining = set(range(n)) - set(selected)
    while len(selected) < k:
        best, best_val = -1, -np.inf
        for c in sorted(remaining):
            penalty = max(sim[c, s] for s in selected)
            val = lambda_ * relevance[c] - (1.0 - lambda_) * penalty
            if val > best_val:
                best, best_val = c, val
        selected.append(best)
        remaining.discard(best)
    return np.asarray(selected, dtype=np.int64)
