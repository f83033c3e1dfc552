"""Embedding-cosine near-duplicate detection.

Exact all-pairs path (the verification/baseline form): stream corpus
blocks against a broadcast embedding matrix, emit pairs with cosine >=
threshold. At 100 TB scale the matrix no longer broadcasts — the scale
path buckets vectors with the IVF coarse quantizer (ann/ivf.py) and runs
all-pairs only WITHIN buckets (candidate pairs may miss cross-bucket
near-dups; nprobe>1 assignment reduces that) — same shape as the
MinHash-LSH pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


class NearDupPairsStage:
    """map_batches callable: each corpus block × broadcast matrix →
    (vec_a < vec_b) pairs above threshold."""

    def __init__(self, all_ref, all_ids, threshold: float,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        mat = ray.get(all_ref) if isinstance(all_ref, ray.ObjectRef) else all_ref
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        self.unit = mat / norms[:, None]
        self.ids = np.asarray(all_ids, dtype=np.int64)
        self.threshold = threshold
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[self.emb_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        emb = flat.reshape(len(ids), -1)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        sims = unit @ self.unit.T  # (nb, N)
        bi, gj = np.nonzero(sims >= self.threshold)
        a = ids[bi]
        b = self.ids[gj]
        keep = a < b  # dedupe (a,b)/(b,a) and self-pairs
        return pa.table(
            {
                "vec_a": pa.array(a[keep]),
                "vec_b": pa.array(b[keep]),
                "cosine": pa.array(sims[bi[keep], gj[keep]]),
            }
        )


def embedding_neardup_pairs(
    ds: "ray.data.Dataset",
    all_vectors: np.ndarray,
    all_ids: np.ndarray,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    ref = ray.put(np.ascontiguousarray(all_vectors, dtype=np.float64))
    return ds.map_batches(
        NearDupPairsStage,
        fn_constructor_kwargs=dict(
            all_ref=ref, all_ids=all_ids, threshold=threshold,
            id_col=id_col, emb_col=emb_col,
        ),
        concurrency=2,
        batch_format="pyarrow",
    )
