"""Int8 scalar-quantized (SQ8) dense retrieval.

The dense index compressed 4x: each embedding dimension maps to one
signed byte with a per-dimension symmetric scale ``s_j = 127 /
max_i |x_ij|`` (classic scalar-quantizer trainer, re-derived from the
published faiss SQ design; the reference delegates dense kNN to the
k-NN plugin, whose byte/fp16 compression modes motivate this tier —
SURVEY.md §2.9, query/NeuralQueryBuilder.java:150-170 neighbor
contract). Scoring is the exact INTEGER dot product of the quantized
vectors, so results are bit-reproducible across engines and the oracle
is pure-integer SQL.

Ray Data shape (mirrors ann/brute.py):
- train: one streaming ``map_batches`` pass emitting ONE dim-sized row
  per block (the per-dimension |max| partial), reduced on the driver —
  the only driver-side data is ``n_blocks × dim`` floats.
- search: the quantized query matrix is broadcast once via ``ray.put``;
  stateless tasks quantize their corpus block on the fly (a persisted
  deployment would materialize the int8 column once and scan that),
  compute the integer dot, and emit LOCAL top-k; a k-sized driver merge
  finishes. The corpus streams — no materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def quantize_sq8(x: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """float -> int8 codes: ``floor(x * s + 0.5)`` (round half toward
    +inf, matching SQL ``floor(v*s + 0.5)``). With ``s = 127/max|x|``
    the product is already in [-127, 127], so no clipping is needed for
    in-domain vectors; out-of-domain queries are clipped like any SQ
    codec would."""
    q = np.floor(np.asarray(x, dtype=np.float64) * scales + 0.5)
    return np.clip(q, -127, 127).astype(np.int8)


def train_sq8_scales(
    ds: "ray.data.Dataset", emb_col: str = "embedding"
) -> np.ndarray:
    """One streaming pass -> per-dimension scale vector (float64).

    Each block contributes a single row holding its per-dim |max|; the
    driver reduces those tiny partials. Dimensions that are all-zero get
    scale 0 (every code quantizes to 0), mirroring the SQL trainer."""

    def block_absmax(batch: pa.Table) -> pa.Table:
        col = batch[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"absmax": pa.array([], pa.list_(pa.float64()))})
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mx = np.abs(flat.reshape(n, -1)).max(axis=0)
        return pa.table({"absmax": pa.array([mx.tolist()])})

    partials = ds.map_batches(block_absmax, batch_format="pyarrow").take_all()
    if not partials:
        raise ValueError("cannot train SQ8 scales on an empty dataset")
    mx = np.max([np.asarray(p["absmax"], dtype=np.float64) for p in partials], axis=0)
    scales = np.zeros_like(mx)
    nz = mx != 0
    scales[nz] = 127.0 / mx[nz]
    return scales


class SQ8TopKStage:
    """Per-block integer-dot top-k against the broadcast quantized
    queries. The dot is computed as a float64 BLAS matmul over the int8
    codes — EXACT, because every partial sum is an integer bounded by
    dim * 127^2 < 2^53 for any dim below ~5e8 (numpy integer matmul has
    no BLAS kernel and measured ~2x slower end-to-end); the result is
    cast back to the exact int64 score."""

    def __init__(self, q_codes: np.ndarray, query_ids: np.ndarray,
                 scales: np.ndarray, k: int = 10,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        self.q = np.ascontiguousarray(q_codes, dtype=np.float64)
        self.query_ids = np.asarray(query_ids, dtype=np.int64)
        self.scales = np.asarray(scales, dtype=np.float64)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:  # empty block: a 0-dim reshape would break matmul
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.int64())}
            )
        col = batch[self.emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        codes = quantize_sq8(flat.reshape(len(ids), -1), self.scales)
        # float64 BLAS matmul over integer-valued operands: exact (see
        # class docstring), then cast to the true int64 score
        sims = (self.q @ codes.astype(np.float64).T).astype(np.int64)
        out_q, out_id, out_s = [], [], []
        kk = min(self.k, ids.size)
        for qi in range(sims.shape[0]):
            row = sims[qi]
            part = (
                np.argpartition(-row, kk - 1)[:kk] if kk < row.size
                else np.arange(row.size)
            )
            order = part[np.lexsort((ids[part], -row[part]))]
            out_q.append(np.full(order.size, self.query_ids[qi], dtype=np.int64))
            out_id.append(ids[order])
            out_s.append(row[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def knn_sq8(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    scales: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Streaming SQ8 kNN: quantize per block, integer-dot local top-k,
    k-sized global merge. Returns (query_id, rank, neighbor_id, score)
    with an int64 score (the exact quantized dot)."""
    q_codes = quantize_sq8(np.asarray(queries, dtype=np.float64), scales)
    bundle_ref = ray.put((np.ascontiguousarray(q_codes),
                          np.asarray(query_ids, dtype=np.int64),
                          np.asarray(scales, dtype=np.float64)))

    # stateless tasks, not an actor pool — same rationale as
    # ann/brute.py knn_brute_force (pool spawn dominated the per-call
    # cost; ray.get of the broadcast bundle is a zero-copy read per task)
    def scan(batch: pa.Table) -> pa.Table:
        qc, qids, sc = ray.get(bundle_ref)
        stage = SQ8TopKStage(qc, qids, sc, k=k, id_col=id_col, emb_col=emb_col)
        return stage(batch)

    local = ds.map_batches(scan, batch_format="pyarrow")
    t = pa.Table.from_pylist(local.take_all())
    if t.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.int64())}
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


def knn_sq8_rescore(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    scales: np.ndarray,
    fetch,
    k: int = 10,
    oversample: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Two-phase quantized dense search (the k-NN plugin's
    quantization + rescore mode: ANN over the compressed codes, exact
    re-score of an oversampled candidate window — same contract as the
    plugin's `rescore` / oversample_factor knob).

    Phase 1 streams the corpus once and ranks by the EXACT int8 dot,
    keeping ``k * oversample`` candidates per query (deterministic: the
    integer score ties break by neighbor id, so the candidate window is
    reproducible across engines). Phase 2 calls ``fetch(sorted unique
    candidate ids) -> (ids, float64 matrix)`` — a pushdown point-read
    bounded by n_queries * k * oversample rows, NOT a second corpus
    scan — and re-scores with full-precision cosine; the returned top-k
    is exact over the candidate window. Recall vs exact float search is
    governed by oversample (quantization rank noise must fit inside the
    window); pytest pins recall on the test corpus."""
    cand = knn_sq8(
        ds, queries, query_ids, scales,
        k=k * oversample, id_col=id_col, emb_col=emb_col,
    )
    if cand.num_rows == 0:
        return pa.table(
            {"query_id": pa.array([], pa.int64()),
             "rank": pa.array([], pa.int64()),
             "neighbor_id": pa.array([], pa.int64()),
             "score": pa.array([], pa.float64())}
        )
    need = np.unique(cand["neighbor_id"].to_numpy())
    fids, fvecs = fetch(need)
    fids = np.asarray(fids, dtype=np.int64)
    order = np.argsort(fids)
    fids, fvecs = fids[order], np.asarray(fvecs, dtype=np.float64)[order]
    fn = np.linalg.norm(fvecs, axis=1)
    fn[fn == 0] = 1.0
    unit_c = fvecs / fn[:, None]
    q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(q, axis=1)
    qn[qn == 0] = 1.0
    unit_q = q / qn[:, None]
    sims = unit_q @ unit_c.T  # (nq, n_candidates)
    qids = np.asarray(query_ids, dtype=np.int64)
    qpos = {int(qv): i for i, qv in enumerate(qids)}
    c_q = cand["query_id"].to_numpy()
    c_n = cand["neighbor_id"].to_numpy()
    out_q, out_r, out_n, out_s = [], [], [], []
    for qv in np.unique(c_q):
        m = c_q == qv
        nids = c_n[m]
        sc = sims[qpos[int(qv)], np.searchsorted(fids, nids)]
        sel = np.lexsort((nids, -sc))[:k]
        out_q.append(np.full(sel.size, qv, dtype=np.int64))
        out_r.append(np.arange(1, sel.size + 1, dtype=np.int64))
        out_n.append(nids[sel])
        out_s.append(sc[sel])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "rank": pa.array(np.concatenate(out_r)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "score": pa.array(np.concatenate(out_s)),
        }
    )
