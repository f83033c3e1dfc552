"""IVF (inverted-file) ANN index — the scale path for embedding search.

Coarse quantizer: deterministic k-means (fixed seed, fixed iterations)
over a sample; vectors are assigned to their nearest centroid's bucket
(a ``groupby(bucket)`` at build time — same shuffle shape as the posting
build). Queries probe the ``nprobe`` nearest centroids and scan only
those buckets — the SEISMIC-style cluster-skipping idea
(sparse/algorithm/seismic/SeismicPostingClusterer.java:21-68) applied to
dense vectors.

Recall is approximate by design; tests assert recall@k >= threshold vs
the brute-force baseline, not equality.
"""

from __future__ import annotations

import numpy as np


class IVFIndex:
    def __init__(self, n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
                 n_iters: int = 10):
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.seed = seed
        self.n_iters = n_iters
        self.centroids: np.ndarray | None = None
        self.buckets: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _normalize(self, x: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(x, axis=1)
        n[n == 0] = 1.0
        return x / n[:, None]

    def fit(self, vectors: np.ndarray, ids: np.ndarray) -> "IVFIndex":
        x = self._normalize(np.asarray(vectors, dtype=np.float64))
        rng = np.random.RandomState(self.seed)
        k = min(self.n_centroids, x.shape[0])
        cent = x[rng.choice(x.shape[0], size=k, replace=False)]
        for _ in range(self.n_iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(k):
                m = assign == c
                if m.any():
                    v = x[m].mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        cent[c] = v / nv
        self.centroids = cent
        assign = np.argmax(x @ cent.T, axis=1)
        ids = np.asarray(ids, dtype=np.int64)
        for c in range(k):
            m = assign == c
            if m.any():
                self.buckets[c] = (ids[m], x[m])
        return self

    def search(self, query: np.ndarray, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        q = np.asarray(query, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        probe = np.argsort(-(self.centroids @ q))[: self.nprobe]
        cand_ids, cand_sims = [], []
        for c in probe:
            if int(c) not in self.buckets:
                continue
            ids, vecs = self.buckets[int(c)]
            cand_ids.append(ids)
            cand_sims.append(vecs @ q)
        if not cand_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(cand_ids)
        sims = np.concatenate(cand_sims)
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]
