"""The _rank_eval API: ranking-quality metrics over a labeled run.

Reference analogue: OpenSearch/ES ``_rank_eval`` endpoint (the plugin's
users evaluate hybrid/rerank pipelines with it) — given per-query rated
documents, score each query's ranked hit list with precision@k,
recall@k, MRR, and (binary-gain) NDCG@k, plus the mean across queries.

Pure driver-side arithmetic over k-sized hit lists (the heavy part —
producing the run and the relevance judgments — is the engine's normal
distributed search path); every metric is re-derivable in SQL, which is
exactly what the suite oracle does.
"""

from __future__ import annotations

import numpy as np

# metric identifiers mirroring the REST API's metric objects
METRICS = ("precision", "recall", "mean_reciprocal_rank", "dcg")


def rank_eval_query(
    ranked_docs: np.ndarray,
    relevant: set[int],
    total_relevant: int,
    k: int = 10,
) -> dict[str, float]:
    """Metrics for ONE query's ranked hit list (rank order = array
    order, rank 1 first — the suite's rounded-score/doc-id discipline).

    - precision@k: relevant retrieved / retrieved (ES divides by the
      ACTUAL retrieved count, not k, when fewer than k return)
    - recall@k: relevant retrieved / total relevant (0 if none exist)
    - MRR: 1/rank of the first relevant hit (0 if none retrieved)
    - NDCG@k (binary gains): DCG = Σ rel_i / log2(i+1) over retrieved
      ranks i, IDCG = Σ_{i=1..min(total,k)} 1/log2(i+1); 0 if IDCG=0.
    """
    docs = np.asarray(ranked_docs, dtype=np.int64)[:k]
    n_ret = docs.size
    is_rel = np.asarray([int(d) in relevant for d in docs], dtype=np.float64)
    n_rel_ret = float(is_rel.sum())
    ranks = np.arange(1, n_ret + 1, dtype=np.float64)
    precision = n_rel_ret / n_ret if n_ret else 0.0
    recall = n_rel_ret / total_relevant if total_relevant else 0.0
    hit_pos = np.flatnonzero(is_rel)
    mrr = 1.0 / ranks[hit_pos[0]] if hit_pos.size else 0.0
    dcg = float((is_rel / np.log2(ranks + 1.0)).sum())
    ideal = np.arange(1, min(total_relevant, k) + 1, dtype=np.float64)
    idcg = float((1.0 / np.log2(ideal + 1.0)).sum())
    ndcg = dcg / idcg if idcg > 0 else 0.0
    return {
        "n_rel_retrieved": n_rel_ret,
        "precision": precision,
        "recall": recall,
        "mrr": mrr,
        "ndcg": ndcg,
    }


def conjunctive_relevance(searcher, terms: list[str]) -> np.ndarray:
    """The suite's deterministic judgment rule: a document is relevant
    for a query iff it contains EVERY analyzer token of the query —
    the intersection of the terms' posting doc sets (sorted doc ids).
    Postings are already decoded/LRU-cached by the run itself, so the
    judgment pass re-reads no storage."""
    sterms = sorted(set(terms))
    if not sterms:
        return np.empty(0, np.int64)
    acc: np.ndarray | None = None
    for t in sterms:
        docs = searcher.postings(t)[0]
        if docs.size == 0:
            return np.empty(0, np.int64)
        acc = docs if acc is None else np.intersect1d(acc, docs)
        if acc.size == 0:
            return acc
    return acc
