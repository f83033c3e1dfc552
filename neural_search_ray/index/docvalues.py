"""Per-shard doc-values sidecar: columnar doc attributes co-located with
the shard state, for engine-side field lookup and filter evaluation.

Reference analogue: Lucene doc-values / OpenSearch fielddata — collapse
and by_field rerank read per-hit field values (ByFieldRerankProcessor
.java:72-160), and filtered queries evaluate the predicate against the
segment, never shipping an accepted-id list from the coordinator.

Ray restatement: attributes are written once per doc shard (same
doc_id % num_shards partitioning as the postings), so a shard's query
actor evaluates predicates and fetches fields LOCALLY. The pipeline
passes a predicate (column, op, value), not an O(N) id array — the
round-1 anti-pattern this replaces.

Build: one groupby(shard) shuffle over the (doc_id, attrs...) input;
files land next to the postings, resumable (skip if present).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

DOCVALUES_DIR = "docvalues"

_OPS = {
    "==": pc.equal,
    "!=": pc.not_equal,
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
}


def build_doc_values(
    ds: "ray.data.Dataset",
    index_dir: str,
    num_shards: int,
    id_column: str = "doc_id",
) -> list[dict]:
    """Write per-shard doc-values files from a (doc_id, attr...) dataset.
    All non-id columns become doc-values columns."""
    out_dir = os.path.join(index_dir, DOCVALUES_DIR)
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__shard", pa.array((ids % num_shards).astype(np.int32))
        )

    def write_shard(group: pa.Table) -> pa.Table:
        s = int(group["__shard"][0].as_py())
        group = group.drop_columns(["__shard"])
        ids = group[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        pq.write_table(
            group.take(pa.array(order)),
            os.path.join(out_dir, f"values_s{s:04d}.parquet"),
        )
        return pa.table({"shard": pa.array([s], pa.int32()),
                         "n": pa.array([len(group)], pa.int64())})

    return (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )  # one row per shard — small


class DocValues:
    """Doc-values reader for a searcher's shard subset. Tables are
    doc_id-sorted, so per-hit lookup is a binary search and predicate
    evaluation is a vectorized Arrow kernel — both shard-local."""

    def __init__(self, index_dir: str, shards: list[int]):
        d = os.path.join(index_dir, DOCVALUES_DIR)
        tables = []
        for s in shards:
            path = os.path.join(d, f"values_s{s:04d}.parquet")
            if os.path.exists(path):
                tables.append(pq.read_table(path))
        if not tables:
            raise FileNotFoundError(f"no doc-values under {d}")
        t = pa.concat_tables(tables)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        self.doc_ids = ids[order]
        self.table = t.take(pa.array(order))
        self._accepted_cache: dict[tuple, np.ndarray] = {}

    def lookup(self, doc_ids: np.ndarray, column: str) -> pa.Array:
        """Field values for the given doc_ids (must exist in the shards)."""
        pos = np.searchsorted(self.doc_ids, np.asarray(doc_ids, dtype=np.int64))
        return self.table[column].take(pa.array(pos)).combine_chunks()

    def accepted(self, column: str, op: str, value) -> np.ndarray:
        """Sorted doc_ids matching the predicate (engine-side filter
        evaluation; cached per predicate)."""
        key = (column, op, value)
        if key not in self._accepted_cache:
            mask = _OPS[op](self.table[column], value)
            mask = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
            self._accepted_cache[key] = self.doc_ids[mask]
        return self._accepted_cache[key]
