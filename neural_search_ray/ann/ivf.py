"""IVF (inverted-file) ANN index — the scale path for embedding search.

Distributed build (``build_ivf_index``), expressed as a Ray pipeline:

1. centroid fit: deterministic spherical k-means (fixed seed/iters) over
   a bounded SAMPLE of the dataset (``ds.limit(sample_size)`` — the only
   driver-side materialization, O(sample), never O(N));
2. assignment: ``map_batches`` against the broadcast centroid matrix
   (``ray.put`` once) adds a bucket id per vector;
3. bucket build: ``groupby(bucket).map_groups`` writes one Parquet file
   per bucket (the posting-build shuffle shape) plus a small manifest.

Query (``IVFSearcher``): probe the ``nprobe`` nearest centroids and scan
only those bucket files — the SEISMIC cluster-skipping idea
(sparse/algorithm/seismic/SeismicPostingClusterer.java:21-68) applied to
dense vectors. ``nprobe >= n_centroids`` scans every bucket and is
provably EXACT (the union of buckets is the whole corpus), which is what
the ``ivf_ann`` queries() entry runs so the brute-force SQL oracle
applies; approximate recall at small nprobe is pytest-asserted.

``IVFIndex`` is the in-memory small-set form (unit tests, per-sample
fitting); it shares the same k-means so both paths agree.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _normalize(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=1)
    n[n == 0] = 1.0
    return x / n[:, None]


def fit_centroids(
    vectors: np.ndarray, n_centroids: int, seed: int = 42, n_iters: int = 10
) -> np.ndarray:
    """Deterministic spherical k-means over an in-memory (sample) matrix."""
    x = _normalize(np.asarray(vectors, dtype=np.float64))
    rng = np.random.RandomState(seed)
    k = min(n_centroids, x.shape[0])
    cent = x[rng.choice(x.shape[0], size=k, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = x[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


class IVFIndex:
    """In-memory IVF over a small vector set (unit-test / sample form).
    The 100-TB path is build_ivf_index + IVFSearcher below."""

    def __init__(self, n_centroids: int = 16, nprobe: int = 4, seed: int = 42,
                 n_iters: int = 10):
        self.n_centroids = n_centroids
        self.nprobe = nprobe
        self.seed = seed
        self.n_iters = n_iters
        self.centroids: np.ndarray | None = None
        self.buckets: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def fit(self, vectors: np.ndarray, ids: np.ndarray) -> "IVFIndex":
        x = _normalize(np.asarray(vectors, dtype=np.float64))
        cent = fit_centroids(x, self.n_centroids, self.seed, self.n_iters)
        self.centroids = cent
        assign = np.argmax(x @ cent.T, axis=1)
        ids = np.asarray(ids, dtype=np.int64)
        for c in range(cent.shape[0]):
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


# --------------------------------------------------------------------------
# distributed build


def build_ivf_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    n_centroids: int = 16,
    sample_size: int = 4096,
    seed: int = 42,
    n_iters: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> dict:
    """Build the on-disk IVF index with the Ray pipeline described in the
    module docstring. Returns the manifest dict (also written to
    out_dir/ivf_manifest.json). Raw embeddings are stored per bucket so
    the searcher scores true cosine (identical to brute force)."""
    os.makedirs(out_dir, exist_ok=True)
    sample = ds.limit(sample_size).take_all()  # bounded: O(sample_size)
    sample_mat = np.asarray([r[emb_col] for r in sample], dtype=np.float64)
    cent = fit_centroids(sample_mat, n_centroids, seed, n_iters)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    cent_ref = ray.put(cent)

    class AssignStage:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            col = batch[emb_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(len(ids), -1) if len(ids) else flat.reshape(0, 0)
            assign = (
                np.argmax(_normalize(mat) @ self.cent.T, axis=1)
                if len(ids)
                else np.empty(0, np.int64)
            )
            return pa.table(
                {
                    "bucket": pa.array(assign.astype(np.int64)),
                    id_col: batch[id_col],
                    emb_col: col,
                }
            )

    def write_bucket(group: pa.Table) -> pa.Table:
        b = int(group["bucket"][0].as_py())
        path = os.path.join(out_dir, f"bucket_{b:05d}.parquet")
        pq.write_table(group.select([id_col, emb_col]), path)
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "n": pa.array([len(group)], pa.int64())})

    manifest_rows = (
        ds.map_batches(AssignStage, concurrency=2, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()
    )  # one row per bucket — small
    manifest = {
        "n_centroids": int(cent.shape[0]),
        "dim": int(cent.shape[1]),
        "id_col": id_col,
        "emb_col": emb_col,
        "buckets": {
            str(int(r["bucket"])): int(r["n"]) for r in manifest_rows
        },
    }
    with open(os.path.join(out_dir, "ivf_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest


class IVFSearcher:
    """Query side of the on-disk IVF index: probes ``nprobe`` buckets,
    loads only those bucket files (LRU-bounded), scores exact cosine of
    the RAW stored embeddings (brute-force-identical within the probed
    set)."""

    def __init__(self, index_dir: str, nprobe: int = 4, cache_buckets: int = 64):
        self.index_dir = index_dir
        self.nprobe = nprobe
        self.centroids = np.load(os.path.join(index_dir, "centroids.npy"))
        with open(os.path.join(index_dir, "ivf_manifest.json")) as f:
            self.manifest = json.load(f)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cache_buckets = cache_buckets

    def _bucket(self, b: int) -> tuple[np.ndarray, np.ndarray] | None:
        if str(b) not in self.manifest["buckets"]:
            return None
        if b not in self._cache:
            if len(self._cache) >= self._cache_buckets:
                self._cache.pop(next(iter(self._cache)))
            t = pq.read_table(
                os.path.join(self.index_dir, f"bucket_{b:05d}.parquet")
            )
            ids = t[self.manifest["id_col"]].to_numpy().astype(np.int64)
            col = t[self.manifest["emb_col"]]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            mat = (
                col.flatten().to_numpy(zero_copy_only=False)
                .astype(np.float64).reshape(len(ids), -1)
            )
            self._cache[b] = (ids, _normalize(mat))
        return self._cache[b]

    def search(
        self, query: np.ndarray, k: int = 10, nprobe: int | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        q = np.asarray(query, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        p = min(nprobe or self.nprobe, self.centroids.shape[0])
        probe = np.argsort(-(self.centroids @ q))[:p]
        cand_ids, cand_sims = [], []
        for b in probe:
            loaded = self._bucket(int(b))
            if loaded is None:
                continue
            ids, unit = loaded
            cand_ids.append(ids)
            cand_sims.append(unit @ q)
        if not cand_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(cand_ids)
        sims = np.concatenate(cand_sims)
        order = np.lexsort((ids, -sims))[:k]
        return ids[order], sims[order]
