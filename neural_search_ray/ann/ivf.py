"""IVF (inverted-file) ANN index — the scale path for embedding search.

Distributed build (``build_ivf_index``), expressed as a Ray pipeline:

1. centroid fit: deterministic spherical k-means (farthest-first seeded,
   fixed seed/iters) over a bounded hash-gated UNBIASED sample of the
   dataset (the only driver-side materialization, O(sample), never O(N));
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
    # k-means++ (D²-weighted) seeding, Arthur & Vassilvitskii SODA'07:
    # first seed random, each next seed drawn with probability ∝ squared
    # angular distance to the nearest chosen seed. Deterministic given the
    # seed, spreads seeds across well-separated clusters (no cluster eats
    # two centroids while another splits — the IVF bucket-balance
    # prerequisite), and — unlike farthest-first — is not hijacked by a
    # single outlier point.
    first = int(rng.randint(x.shape[0]))
    chosen = [first]
    best_sim = x @ x[first]  # similarity to nearest chosen seed, per point
    for _ in range(k - 1):
        d2 = np.square(1.0 - np.clip(best_sim, -1.0, 1.0))
        total = d2.sum()
        if total <= 0:  # all points coincide with a seed
            nxt = int(rng.randint(x.shape[0]))
        else:
            nxt = int(rng.choice(x.shape[0], p=d2 / total))
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, x @ x[nxt])
    cent = x[chosen].copy()
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

_MASK63 = np.uint64(0x7FFF_FFFF_FFFF_FFFF)
IVF_FORMAT_VERSION = 1


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Steele et al.): vectorized
    full-avalanche mixing of uint64 — uint64 wrap = mod 2^64."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _sample_embeddings(
    ds: "ray.data.Dataset", sample_size: int, seed: int, id_col: str, emb_col: str
) -> np.ndarray:
    """Deterministic UNBIASED centroid sample: keep a row iff
    h63(id || seed) clears a rate-scaled gate (the quality_sample
    hash-gate pattern), then take the sample_size smallest hashes.

    Unlike ``ds.limit(sample_size)`` (the round-2 version) this is
    independent of row order — on an id-sorted corpus whose content
    correlates with id, a prefix sample fits centroids on a biased slice
    and skews bucket sizes. The gate bounds the driver materialization to
    ~1.25× sample_size rows regardless of N."""
    n_total = ds.count()
    rate = 1.0 if n_total <= sample_size else min(1.0, 1.25 * sample_size / n_total)
    gate = np.int64(min(int(rate * float(_MASK63)), int(_MASK63)))
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)

    def keep_sampled(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # splitmix64 finalizer: full-avalanche integer mixing, fully
        # vectorized (an AFFINE map like universal_hash would leave
        # sequential ids order-preserving — the gate would then pass
        # everything and the smallest-hash truncation would be a prefix
        # sample again, the exact bias this function exists to remove)
        h = _mix64(ids.astype(np.uint64) ^ salt)
        h = (h & _MASK63).astype(np.int64)
        m = h <= gate
        col = batch[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table({"h": pa.array(h[m]), emb_col: col.take(np.nonzero(m)[0])})

    rows = ds.map_batches(keep_sampled, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r["h"]))  # deterministic truncation order
    rows = rows[:sample_size]
    return np.asarray([r[emb_col] for r in rows], dtype=np.float64)


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
    sample_mat = _sample_embeddings(ds, sample_size, seed, id_col, emb_col)
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
        # Angular radius of the bucket: the MIN member·centroid dot (unit
        # vectors) — lets radial queries prune whole buckets with the
        # exact spherical bound cos(max(0, θ(q,c) − r_b)) < min_score.
        col = group[emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = (
            col.flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64).reshape(len(group), -1)
        )
        mindot = float(np.min(_normalize(mat) @ cent[b]))
        return pa.table({"bucket": pa.array([b], pa.int64()),
                         "n": pa.array([len(group)], pa.int64()),
                         "mindot": pa.array([mindot], pa.float64())})

    manifest_rows = (
        ds.map_batches(AssignStage, concurrency=2, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pyarrow")
        .take_all()
    )  # one row per bucket — small
    manifest = {
        # 1 = round-3 layout (bucket_mindot + farthest-first centroids);
        # round-2 manifests have no field and read as version 0 (no radial
        # pruning available, still exact). Same BWC discipline as
        # index/manifest.py.
        "format_version": IVF_FORMAT_VERSION,
        "n_centroids": int(cent.shape[0]),
        "dim": int(cent.shape[1]),
        "id_col": id_col,
        "emb_col": emb_col,
        "buckets": {
            str(int(r["bucket"])): int(r["n"]) for r in manifest_rows
        },
        "bucket_mindot": {
            str(int(r["bucket"])): float(r["mindot"]) for r in manifest_rows
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
        version = self.manifest.get("format_version", 0)
        if version > IVF_FORMAT_VERSION:
            from ..index.manifest import IndexFormatError

            raise IndexFormatError(
                f"IVF index at {index_dir!r} has format_version={version}; "
                f"this reader supports <= {IVF_FORMAT_VERSION}"
            )
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

    def radial_buckets(self, query: np.ndarray, threshold: float) -> list[int]:
        """Bucket ids that MIGHT hold a within-radius member — the exact
        spherical pruning bound. For unit vectors, the angle triangle
        inequality gives θ(q,x) ≥ θ(q,c_b) − r_b where r_b is the bucket's
        angular radius (arccos of the stored min member·centroid dot), so
        the best possible member similarity in bucket b is
        cos(max(0, θ(q,c_b) − r_b)); any bucket whose bound is below the
        threshold cannot contain a match. Manifests written before round 3
        lack ``bucket_mindot`` — those buckets are never pruned (still
        exact, just slower)."""
        q = np.asarray(query, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        mindots = self.manifest.get("bucket_mindot", {})
        out = []
        for bs in self.manifest["buckets"]:
            b = int(bs)
            if bs in mindots:
                theta_qc = np.arccos(np.clip(float(self.centroids[b] @ q), -1.0, 1.0))
                r_b = np.arccos(np.clip(float(mindots[bs]), -1.0, 1.0))
                bound = np.cos(max(0.0, theta_qc - r_b))
                if bound < threshold:
                    continue
            out.append(b)
        return out

    def radial_search(
        self,
        query: np.ndarray,
        min_score: float | None = None,
        max_distance: float | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """EXACT radial retrieval over the IVF index: centroid-distance
        pruning bounds the scan (radial_buckets), surviving buckets are
        scanned and filtered. Same semantics as ann.brute.radial_search
        (reference query/NeuralQueryBuilder.java:156-157,232)."""
        from .brute import _radial_threshold

        thr = _radial_threshold(min_score, max_distance)
        q = np.asarray(query, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        cand_ids, cand_sims = [], []
        for b in self.radial_buckets(q, thr):
            loaded = self._bucket(b)
            if loaded is None:
                continue
            ids, unit = loaded
            sims = unit @ q
            m = sims >= thr
            if m.any():
                cand_ids.append(ids[m])
                cand_sims.append(sims[m])
        if not cand_ids:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ids = np.concatenate(cand_ids)
        sims = np.concatenate(cand_sims)
        order = np.lexsort((ids, -sims))
        return ids[order], sims[order]
