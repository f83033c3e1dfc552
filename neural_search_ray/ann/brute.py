"""Brute-force cosine top-k over an embedding column.

The dense `neural` query stub for this tier (SURVEY.md §2.9: the
reference delegates dense kNN to the k-NN plugin; out of core scope, so
brute-force cosine IS the baseline here, with IVF as the scale path).

Ray Data shape: the (small) query matrix is broadcast via ``ray.put``
once; each ``map_batches`` task computes a float64 matmul of its batch
against the query matrix and emits its LOCAL top-k per query; a final
small reduce merges per-batch top-k (k-sized, driver-side). The corpus
streams — no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _cosine_topk_block(
    emb: np.ndarray, ids: np.ndarray, queries: np.ndarray, qids: np.ndarray, k: int
) -> pa.Table:
    """Local top-k per query for one block. float64 throughout."""
    e = emb.astype(np.float64)
    q = queries.astype(np.float64)
    e_norm = np.linalg.norm(e, axis=1)
    q_norm = np.linalg.norm(q, axis=1)
    e_norm[e_norm == 0] = 1.0
    q_norm[q_norm == 0] = 1.0
    sims = (q / q_norm[:, None]) @ (e / e_norm[:, None]).T  # (nq, nb)
    out_q, out_id, out_s = [], [], []
    kk = min(k, ids.size)
    for qi in range(sims.shape[0]):
        row = sims[qi]
        part = np.argpartition(-row, kk - 1)[:kk] if kk < row.size else np.arange(row.size)
        order = part[np.lexsort((ids[part], -row[part]))]
        out_q.append(np.full(order.size, qids[qi], dtype=np.int64))
        out_id.append(ids[order])
        out_s.append(row[order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        }
    )


class BruteForceKNNStage:
    """map_batches callable: queries held per actor (from a ray.put ref or
    ndarray), scores each corpus batch, emits local top-k."""

    def __init__(self, queries_ref, query_ids, k: int = 10,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        self.queries = (
            ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        )
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        emb_col = batch[self.emb_col]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        flat = emb_col.flatten().to_numpy(zero_copy_only=False)
        dim = len(flat) // max(len(ids), 1)
        emb = flat.reshape(len(ids), dim)
        return _cosine_topk_block(emb, ids, self.queries, self.query_ids, self.k)


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Streaming brute-force kNN: per-block local top-k then a k-sized
    global merge. Returns (query_id, rank, neighbor_id, score)."""
    queries_ref = ray.put(np.ascontiguousarray(queries, dtype=np.float64))
    local = ds.map_batches(
        BruteForceKNNStage,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, query_ids=query_ids, k=k,
            id_col=id_col, emb_col=emb_col,
        ),
        concurrency=2,
        batch_format="pyarrow",
    )
    t = pa.Table.from_pylist(local.take_all())
    qid = t["query_id"].to_numpy()
    nid = t["neighbor_id"].to_numpy()
    sc = t["score"].to_numpy()
    out_q, out_r, out_n, out_s = [], [], [], []
    for q in np.unique(qid):
        m = qid == q
        order = np.lexsort((nid[m], -sc[m]))[:k]
        out_q.append(np.full(order.size, q, dtype=np.int64))
        out_r.append(np.arange(1, order.size + 1, dtype=np.int64))
        out_n.append(nid[m][order])
        out_s.append(sc[m][order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "rank": pa.array(np.concatenate(out_r)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "score": pa.array(np.concatenate(out_s)),
        }
    )
