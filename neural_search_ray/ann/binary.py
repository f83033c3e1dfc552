"""Binary-quantized dense tier (ES bit vectors / BBQ shape).

Public-surface analogue: Elasticsearch's binary-quantized kNN
(`dense_vector` with `bit` element type / BBQ index option): each
dimension stores ONE sign bit (32x smaller than float32), the first
phase ranks by Hamming distance over the packed words, and an exact
float rescore pass over the small candidate window restores ranking
quality — the same two-phase shape as the SQ8 and PQ tiers
(ann/sq8.py, ann/pq.py), with the cheapest possible phase 1.

Pinned semantics (SQL-mirrorable): bit_d = (v_d >= 0); hamming(q, x) =
#dims where bits differ; phase-1 candidates = top-C by (hamming asc,
vec_id asc); final = top-k by (exact cosine desc, vec_id asc) over the
candidates.

Scale shape: packing is a per-batch numpy packbits pass (no
materialized packed index needed for the brute tier — streaming, like
knn_brute_force); every block emits at most C rows per query, so the
driver merge is O(C x queries x blocks) with embeddings attached only
to candidate rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["pack_bits", "hamming_matrix", "knn_binary_rescore"]

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


def pack_bits(vecs: np.ndarray) -> np.ndarray:
    """(n, d) float -> (n, ceil(d/8)) uint8 sign-bit packing
    (bit = v >= 0, big-endian within each byte — np.packbits order)."""
    return np.packbits(vecs >= 0.0, axis=1)


def hamming_matrix(qbits: np.ndarray, xbits: np.ndarray) -> np.ndarray:
    """(nq, B) x (n, B) packed uint8 -> (nq, n) Hamming distances via
    one XOR + byte-table popcount (vectorized, no Python loops)."""
    x = np.bitwise_xor(qbits[:, None, :], xbits[None, :, :])
    return _POPCNT8[x].sum(axis=2)


def knn_binary_rescore(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Two-phase binary kNN over an embeddings Dataset: streaming
    per-block Hamming top-C (phase 1, 1 bit/dim), exact cosine rescore
    of the merged C-sized window (phase 2).  Returns
    (query_id, rank, neighbor_id, score=cosine)."""
    if candidates < k:
        raise ValueError("candidates must be >= k")
    queries = np.asarray(queries, dtype=np.float64)
    qbits = pack_bits(queries)
    nq = len(queries)

    def block_topc(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ham = hamming_matrix(qbits, pack_bits(vecs))  # (nq, n)
        out_q, out_id, out_h, out_vec = [], [], [], []
        for qi in range(nq):
            order = np.lexsort((ids, ham[qi]))[:candidates]
            out_q.append(np.full(order.size, query_ids[qi], np.int64))
            out_id.append(ids[order])
            out_h.append(ham[qi][order])
            out_vec.append(vecs[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_id)),
            "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
            "emb": pa.array(
                list(np.concatenate(out_vec)),
                pa.list_(pa.float64()),
            ),
        })

    rows = ds.map_batches(block_topc, batch_format="pyarrow").take_all()
    qs = np.array([r["query_id"] for r in rows], np.int64)
    ns = np.array([r["neighbor_id"] for r in rows], np.int64)
    hs = np.array([r["hamming"] for r in rows], np.int64)
    embs = np.array([r["emb"] for r in rows], np.float64) if rows else (
        np.empty((0, queries.shape[1]))
    )

    out_rows = {"query_id": [], "rank": [], "neighbor_id": [], "score": []}
    qnorm = np.linalg.norm(queries, axis=1)
    for qi in range(nq):
        qid = int(query_ids[qi])
        m = qs == qid
        # global phase-1 window: top-C by (hamming, neighbor_id)
        order = np.lexsort((ns[m], hs[m]))[:candidates]
        cand_ids = ns[m][order]
        cand_embs = embs[m][order]
        # phase 2: exact cosine over the window only
        norms = np.linalg.norm(cand_embs, axis=1)
        cos = (cand_embs @ queries[qi]) / np.maximum(
            norms * qnorm[qi], 1e-300
        )
        final = np.lexsort((cand_ids, -cos))[:k]
        out_rows["query_id"].extend([qid] * final.size)
        out_rows["rank"].extend(range(1, final.size + 1))
        out_rows["neighbor_id"].extend(cand_ids[final].tolist())
        out_rows["score"].extend(cos[final].tolist())
    return pa.table({
        "query_id": pa.array(out_rows["query_id"], pa.int64()),
        "rank": pa.array(out_rows["rank"], pa.int64()),
        "neighbor_id": pa.array(out_rows["neighbor_id"], pa.int64()),
        "score": pa.array(out_rows["score"], pa.float64()),
    })
