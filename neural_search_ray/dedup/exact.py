"""Exact deduplication: hash-partition by content hash, keep first doc.

Ray Data shape: ``map_batches`` computes md5 text hashes (the combiner
emits per-batch (hash, min_id, count) partials), then a ``groupby(hash)``
aggregate keeps the minimum doc_id per distinct content and counts
duplicates. The shuffle moves one small row per distinct content per
input block — not the documents themselves.

(The reference has no corpus-level dedup — OpenSearch upserts by _id;
this is a training-data-pipeline operator, SURVEY.md §2.7 note.)
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from .common import h64


def _partial(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    import numpy as np

    ids = batch[id_col].to_numpy(zero_copy_only=False)
    hashes = np.fromiter(
        (h64(t or "") & 0x7FFFFFFFFFFFFFFF for t in batch[text_col].to_pylist()),
        dtype=np.int64,
        count=len(batch),
    )
    order = np.lexsort((ids, hashes))
    h, idx = np.unique(hashes[order], return_index=True)
    # first occurrence per hash within batch = min id (ids sorted within hash)
    counts = np.diff(np.append(idx, hashes.size))
    return pa.table(
        {
            "text_hash": pa.array(h, type=pa.int64()),
            "keeper_doc_id": pa.array(ids[order][idx], type=pa.int64()),
            "n_docs": pa.array(counts, type=pa.int64()),
        }
    )


def exact_dedup(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """→ Dataset(text_hash, keeper_doc_id, n_docs) one row per distinct text.

    text_hash is the 63-bit mask of md5_number_lower (int64) — identical
    to DuckDB's md5_number_lower(text) & 0x7fff... for the oracle (63-bit
    so plain int64 conversions never overflow).
    """
    from ray.data.aggregate import Count, Min, Sum

    partials = ds.map_batches(
        lambda b: _partial(b, id_col, text_col), batch_format="pyarrow"
    )
    return (
        partials.groupby("text_hash")
        .aggregate(
            Min("keeper_doc_id", alias_name="keeper_doc_id"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )
