"""Late-interaction multi-vector scoring (maxSim).

Public-surface analogue: Elasticsearch's ``rank_vectors`` field type
with maxSim scoring (8.18) — the ColBERT-style late-interaction model
(Khattab & Zaharia, SIGIR 2020): a document holds MANY vectors, a query
holds many vectors, and score(q, d) = sum over query vectors of the max
dot product against any document vector.

Execution is one batched einsum per block: queries (nq, m, k) x docs
(n, m, k) -> all pairwise sub-vector dots (nq, qm, n, dm), max over
document sub-vectors, sum over query sub-vectors — no Python loops over
vectors; per-block top-k rows feed a k-sized driver merge exactly like
the brute cosine tier (ann/brute.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["maxsim_scores", "knn_maxsim"]


def maxsim_scores(queries: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """(nq, qm, k) x (n, dm, k) -> (nq, n) maxSim scores."""
    dots = np.einsum("qik,njk->qinj", queries, docs)
    return dots.max(axis=3).sum(axis=1)


def knn_maxsim(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    num_sub: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Top-k late-interaction search over an embeddings Dataset whose
    flat vectors are interpreted as ``num_sub`` equal sub-vectors (the
    deterministic multi-vector fixture; a real multi-vector column is
    list<list<float>> and skips the reshape).  Ties break on
    (score desc, vec_id asc).  Returns (query_id, rank, neighbor_id,
    score)."""
    queries = np.asarray(queries, dtype=np.float64)
    nq, qm, sub = queries.shape
    rows_all = []

    def block_topk(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        docs = vecs.reshape(len(vecs), num_sub, -1)
        scores = maxsim_scores(queries, docs)  # (nq, n)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            order = np.lexsort((ids, -scores[qi]))[:k]
            out_q.append(np.full(order.size, query_ids[qi], np.int64))
            out_id.append(ids[order])
            out_s.append(scores[qi][order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    rows = ds.map_batches(block_topk, batch_format="pyarrow").take_all()
    qs = np.array([r["query_id"] for r in rows], np.int64)
    ns = np.array([r["neighbor_id"] for r in rows], np.int64)
    ss = np.array([r["score"] for r in rows], np.float64)
    out = {"query_id": [], "rank": [], "neighbor_id": [], "score": []}
    for qi in range(nq):
        qid = int(query_ids[qi])
        m = qs == qid
        order = np.lexsort((ns[m], -ss[m]))[:k]
        out["query_id"].extend([qid] * order.size)
        out["rank"].extend(range(1, order.size + 1))
        out["neighbor_id"].extend(ns[m][order].tolist())
        out["score"].extend(ss[m][order].tolist())
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "rank": pa.array(out["rank"], pa.int64()),
        "neighbor_id": pa.array(out["neighbor_id"], pa.int64()),
        "score": pa.array(out["score"], pa.float64()),
    })
