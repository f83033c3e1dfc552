"""Product-quantized (PQ) dense retrieval with ADC scoring.

The memory-scale tier of the dense index: each UNIT-normalized
embedding is split into ``m`` subspaces and every subvector is replaced
by the id of its nearest codebook centroid — ``m`` bytes per vector
(for ks ≤ 256) instead of ``4·dim``, the compression that makes a
100-TB embedding corpus fit a cluster's RAM tier. Re-derived from the
published PQ design (Jégou, Douze, Schmid: "Product Quantization for
Nearest Neighbor Search", TPAMI 2011) and the faiss IndexPQ contract;
the reference delegates dense kNN to the k-NN plugin, whose PQ
("encoder": pq) mode motivates this tier (SURVEY.md §2.9).

Query scoring is ADC (asymmetric distance computation): the query stays
full-precision, a per-subspace lookup table ``LUT[j][c] = q_j ·
centroid_{j,c}`` is built once per query, and a vector's approximate
cosine is ``Σ_j LUT[j][code_j]`` — per block a pure fancy-index gather
+ sum, no matmul against the corpus.

Ray Data shape (mirrors ann/sq8.py):
- train: deterministic hash-gated sample (``ivf._sample_embeddings`` —
  unbiased under id-correlated row order) → per-subspace Lloyd k-means
  on the driver sample (sample-bounded, farthest-first seeded like
  ivf.fit_centroids); the codebook is tiny (m·ks·dsub floats).
- encode+search: ONE streaming pass; each stateless task encodes its
  block against the broadcast codebooks and gathers ADC scores for the
  broadcast query LUTs, emitting LOCAL top-k; a k-sized driver merge
  finishes. (A persisted deployment materializes the uint8 code column
  once at build and scans that — 16-64x less I/O than the float
  column; the on-the-fly encode here keeps the suite self-contained.)
- rescore: the sq8 two-phase contract — ADC candidate window of
  ``k·oversample`` per query, exact float64 cosine over a pushdown
  point-read of just those ids. Window determinism: ADC scores tie-break
  by neighbor id, so the candidate set is reproducible; recall vs exact
  search is governed by oversample and pytest-pinned, and the suite
  entry's oversample is sized so the rescored top-k is EXACT on the
  test corpora (oracle = the exact-cosine SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .ivf import _sample_embeddings


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    return mat / n[:, None]


def train_pq_codebooks(
    ds: "ray.data.Dataset",
    m: int = 4,
    ks: int = 16,
    sample_size: int = 2048,
    seed: int = 42,
    n_iters: int = 15,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic PQ trainer → codebooks of shape (m, ks, dim/m).

    Per subspace: farthest-first seeding from the hash-ordered sample
    (first seed = sample row 0 — the smallest-hash row, deterministic)
    then ``n_iters`` Lloyd iterations; empty cells re-seed to the point
    farthest from its assigned centroid, so cells never silently die.
    All on the driver over the bounded sample — the only data that ever
    leaves the cluster is ~1.25·sample_size rows."""
    sample = _normalize(
        _sample_embeddings(ds, sample_size, seed, id_col, emb_col)
    )
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    ks = min(ks, n)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * dsub : (j + 1) * dsub]
        # farthest-first init (deterministic; ties break to lowest index)
        cent = np.empty((ks, dsub))
        cent[0] = x[0]
        d2 = ((x - cent[0]) ** 2).sum(axis=1)
        for c in range(1, ks):
            cent[c] = x[int(np.argmax(d2))]
            d2 = np.minimum(d2, ((x - cent[c]) ** 2).sum(axis=1))
        for _ in range(n_iters):
            dist = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(dist, axis=1)
            mind = dist[np.arange(n), assign]
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
                else:  # re-seed dead cell at the worst-fit point
                    w = int(np.argmax(mind))
                    cent[c] = x[w]
                    mind[w] = 0.0
        books[j] = cent
    return books


def encode_pq(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Unit-normalized vectors → (n, m) uint8 codes (nearest centroid
    per subspace, ties to the lowest centroid id via argmin)."""
    mat = _normalize(np.asarray(mat, dtype=np.float64))
    n = mat.shape[0]
    m, ks, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        x = mat[:, j * dsub : (j + 1) * dsub]
        # ||x-c||^2 = ||x||^2 - 2 x·c + ||c||^2; argmin over c drops ||x||^2
        dist = books[j] @ x.T  # (ks, n)
        dist = (books[j] ** 2).sum(axis=1)[:, None] - 2.0 * dist
        codes[:, j] = np.argmin(dist, axis=0)
    return codes


def adc_tables(queries: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Per-query ADC lookup tables (nq, m, ks): LUT[q, j, c] =
    unit_q[j-th slice] · centroid_{j,c}."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    m, ks, dsub = books.shape
    nq = q.shape[0]
    luts = np.empty((nq, m, ks), dtype=np.float64)
    for j in range(m):
        luts[:, j, :] = q[:, j * dsub : (j + 1) * dsub] @ books[j].T
    return luts


def knn_pq(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Streaming PQ/ADC kNN: encode per block, gather-sum ADC scores,
    LOCAL top-k per block, k-sized global merge. Returns (query_id,
    rank, neighbor_id, score) with the float64 ADC score."""
    luts = adc_tables(queries, books)
    bundle_ref = ray.put(
        (
            np.ascontiguousarray(books),
            np.ascontiguousarray(luts),
            np.asarray(query_ids, dtype=np.int64),
        )
    )

    def scan(batch: pa.Table) -> pa.Table:
        bks, lt, qids = ray.get(bundle_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        mat = (
            col.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(ids), -1)
        )
        codes = encode_pq(mat, bks)
        nq, m, _ = lt.shape
        kk = min(k, len(ids))
        out_q, out_n, out_s = [], [], []
        for qi in range(nq):
            # ADC gather: scores = Σ_j LUT[qi, j, codes[:, j]]
            sc = np.zeros(len(ids), dtype=np.float64)
            for j in range(m):
                sc += lt[qi, j, codes[:, j]]
            sel = np.lexsort((ids, -sc))[:kk]
            out_q.append(np.full(sel.size, qids[qi], dtype=np.int64))
            out_n.append(ids[sel])
            out_s.append(sc[sel])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    t = pa.Table.from_pylist(
        ds.map_batches(scan, batch_format="pyarrow").take_all()
    )
    if t.num_rows == 0:
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
        msk = qid == q
        order = np.lexsort((nid[msk], -sc[msk]))[:k]
        out_q.append(np.full(order.size, q, dtype=np.int64))
        out_r.append(np.arange(1, order.size + 1, dtype=np.int64))
        out_n.append(nid[msk][order])
        out_s.append(sc[msk][order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q)),
            "rank": pa.array(np.concatenate(out_r)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "score": pa.array(np.concatenate(out_s)),
        }
    )


def knn_pq_rescore(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    query_ids: np.ndarray,
    books: np.ndarray,
    fetch,
    k: int = 10,
    oversample: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Two-phase PQ search (the k-NN plugin's pq + rescore mode, same
    contract as ann/sq8.knn_sq8_rescore): ADC candidate window of
    ``k·oversample`` per query over ONE corpus stream, then exact
    float64 cosine over ``fetch(sorted unique candidate ids)`` — a
    point-read bounded by n_queries·k·oversample rows. The final top-k
    is exact over the window; window recall is oversample-governed and
    pytest-pinned."""
    cand = knn_pq(
        ds, queries, query_ids, books,
        k=k * oversample, id_col=id_col, emb_col=emb_col,
    )
    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if cand.num_rows == 0:
        return empty
    need = np.unique(cand["neighbor_id"].to_numpy())
    fids, fvecs = fetch(need)
    fids = np.asarray(fids, dtype=np.int64)
    order = np.argsort(fids)
    fids = fids[order]
    unit_c = _normalize(np.asarray(fvecs, dtype=np.float64)[order])
    unit_q = _normalize(np.asarray(queries, dtype=np.float64))
    sims = unit_q @ unit_c.T
    qids = np.asarray(query_ids, dtype=np.int64)
    qpos = {int(qv): i for i, qv in enumerate(qids)}
    c_q = cand["query_id"].to_numpy()
    c_n = cand["neighbor_id"].to_numpy()
    out_q, out_r, out_n, out_s = [], [], [], []
    for qv in np.unique(c_q):
        msk = c_q == qv
        nids = c_n[msk]
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
