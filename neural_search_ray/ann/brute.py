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
        if len(ids) == 0:  # empty block: a 0-dim reshape would break matmul
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        emb_col = batch[self.emb_col]
        if isinstance(emb_col, pa.ChunkedArray):
            emb_col = emb_col.combine_chunks()
        flat = emb_col.flatten().to_numpy(zero_copy_only=False)
        emb = flat.reshape(len(ids), -1)
        return _cosine_topk_block(emb, ids, self.queries, self.query_ids, self.k)


def _radial_threshold(min_score: float | None, max_distance: float | None) -> float:
    """Resolve the radial threshold. Exactly one of min_score /
    max_distance must be given (the reference's NeuralQueryBuilder radial
    contract, query/NeuralQueryBuilder.java:156-157,232); cosine distance
    is 1 - cosine similarity, so max_distance=d ⇔ min_score=1-d."""
    if (min_score is None) == (max_distance is None):
        raise ValueError("radial search requires exactly one of min_score / max_distance")
    return float(min_score) if min_score is not None else 1.0 - float(max_distance)


class RadialSearchStage:
    """map_batches callable: emits every (query, neighbor) pair in the
    block whose cosine similarity clears the radial threshold. Unlike the
    top-k stage there is no per-block truncation — the result is exactly
    the within-radius set, so no merge step is needed."""

    def __init__(self, queries_ref, query_ids, min_score: float,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        self.queries = (
            ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        )
        qn = np.linalg.norm(self.queries, axis=1)
        qn[qn == 0] = 1.0
        self.unit_q = self.queries / qn[:, None]
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.min_score = min_score
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:  # empty block: (0, 0) reshape would break matmul
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        col = batch[self.emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        emb = flat.reshape(len(ids), -1)
        e_norm = np.linalg.norm(emb, axis=1)
        e_norm[e_norm == 0] = 1.0
        sims = self.unit_q @ (emb / e_norm[:, None]).T  # (nq, nb)
        qi, ni = np.nonzero(sims >= self.min_score)
        return pa.table(
            {
                "query_id": pa.array(self.query_ids[qi]),
                "neighbor_id": pa.array(ids[ni]),
                "score": pa.array(sims[qi, ni]),
            }
        )


def radial_search(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    min_score: float | None = None,
    max_distance: float | None = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    as_dataset: bool = False,
) -> "pa.Table | ray.data.Dataset":
    """Radial (threshold) dense retrieval: ALL neighbors with cosine
    similarity >= min_score (equivalently cosine distance <=
    max_distance), the reference `neural` query's radial variant
    (query/NeuralQueryBuilder.java:156-157,232).

    Streaming: each block emits only its within-radius pairs; there is no
    top-k merge because the semantics are exact set membership. With
    ``as_dataset=True`` the (unsorted) match Dataset is returned for
    sink-sized results; the default collects and sorts — use it only when
    the radius is selective enough that matches fit the driver."""
    thr = _radial_threshold(min_score, max_distance)
    queries_ref = ray.put(np.ascontiguousarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)

    # stateless tasks, not an actor pool: ray.get(queries_ref) is a
    # zero-copy object-store read per task, and tasks scale with block
    # count with no pool-spawn latency (measured 3x faster per call)
    def scan(batch: pa.Table) -> pa.Table:
        stage = RadialSearchStage(
            ray.get(queries_ref), qids, min_score=thr, id_col=id_col, emb_col=emb_col
        )
        return stage(batch)

    matches = ds.map_batches(scan, batch_format="pyarrow")
    if as_dataset:
        return matches
    t = pa.Table.from_pylist(matches.take_all())
    if t.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    order = np.lexsort(
        (t["neighbor_id"].to_numpy(), -t["score"].to_numpy(), t["query_id"].to_numpy())
    )
    return t.take(order)


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    accepted_ids: np.ndarray | None = None,
) -> pa.Table:
    """Streaming brute-force kNN: per-block local top-k then a k-sized
    global merge. Returns (query_id, rank, neighbor_id, score).

    ``accepted_ids``: optional FILTERED search (the k-NN plugin's
    filtered-kNN mode): a sorted int64 id whitelist — typically the
    output of a metadata predicate on another table — broadcast ONCE
    via ray.put and membership-tested per block with searchsorted
    (zero-copy object-store read per task; the embeddings stream is
    never joined or shuffled). Exact: filtering happens BEFORE the
    local top-k, so no post-filter recall loss. For a predicate on a
    column resident in the embeddings table itself, prefer a
    ``filters=`` pushdown at read_parquet instead."""
    queries_ref = ray.put(np.ascontiguousarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    acc_ref = (
        ray.put(np.unique(np.asarray(accepted_ids, dtype=np.int64)))
        if accepted_ids is not None
        else None
    )

    # stateless tasks (not an actor pool): per-call pool spawn cost ~1.1 s
    # dominated this operator in BENCH_r02 (knn_cosine 1.376 → 1.805 s);
    # interleaved A/B at 32 cpus: actor 1.44-1.60 s vs stateless
    # 0.44-0.50 s. ray.get of the broadcast query matrix is a zero-copy
    # object-store read per task.
    def scan(batch: pa.Table) -> pa.Table:
        if acc_ref is not None:
            acc = ray.get(acc_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(acc, ids)
            pos_c = np.minimum(pos, acc.size - 1) if acc.size else pos
            keep = acc[pos_c] == ids if acc.size else np.zeros(ids.size, bool)
            batch = batch.filter(pa.array(keep))
        stage = BruteForceKNNStage(
            ray.get(queries_ref), qids, k=k, id_col=id_col, emb_col=emb_col
        )
        return stage(batch)

    local = ds.map_batches(scan, batch_format="pyarrow")
    t = pa.Table.from_pylist(local.take_all())
    if t.num_rows == 0:  # nothing survived the filter / empty corpus
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            }
        )
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
