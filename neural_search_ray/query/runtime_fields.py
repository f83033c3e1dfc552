"""Runtime fields (ES runtime mappings).

Public-surface analogue: Elasticsearch runtime fields — fields
computed at QUERY time from indexed/doc-values data, usable in
filters, sorts and aggregations without reindexing.  ES compiles
Painless scripts; this engine registers named **vectorized kernels**
(the same registry pattern as query/scripts.py's script_score): a
runtime field is ``(source_columns, kernel)`` where the kernel maps a
dict of Arrow/numpy source arrays to one numpy value array for the
whole shard-local doc-values table in ONE call — never per document.

Scale shape: evaluation is shard-local over the doc-values sidecar
(already memory-resident per query actor), the computed column is
cached per (DocValues, field) so repeated filters/aggs pay once, and
the accepted-set form feeds the ordinary filtered-BM25 conjunction —
no O(N) arrays cross the pipeline boundary beyond the shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "RUNTIME_FIELDS", "register_runtime_field", "runtime_column",
    "accepted_runtime", "runtime_lookup", "terms_agg_runtime",
]

# name -> (source doc-values columns, kernel(dict[col -> pa.Array]) -> np.ndarray)
RUNTIME_FIELDS: dict[str, tuple[list[str], object]] = {}


def register_runtime_field(
    name: str, columns: list[str], kernel, *, overwrite: bool = False
) -> None:
    if not overwrite and name in RUNTIME_FIELDS:
        raise ValueError(f"runtime field {name!r} already registered")
    RUNTIME_FIELDS[name] = (list(columns), kernel)


def runtime_column(dv, name: str) -> np.ndarray:
    """The runtime field's values aligned with ``dv.doc_ids`` (one
    vectorized kernel call per (doc-values table, field), cached ON the
    DocValues instance so entries die with it — a module-level cache
    keyed on id(dv) both leaked for the process lifetime and could
    serve another table's values when CPython reuses a freed id)."""
    cache = getattr(dv, "_runtime_cache", None)
    if cache is None:
        cache = {}
        dv._runtime_cache = cache
    if name not in cache:
        if name not in RUNTIME_FIELDS:
            raise KeyError(
                f"unknown runtime field {name!r}; registered: "
                f"{sorted(RUNTIME_FIELDS)}"
            )
        cols, kernel = RUNTIME_FIELDS[name]
        src = {c: dv.table[c].combine_chunks() for c in cols}
        vals = np.asarray(kernel(src))
        if len(vals) != len(dv.doc_ids):
            raise ValueError(
                f"runtime field {name!r} kernel returned {len(vals)} values "
                f"for {len(dv.doc_ids)} docs"
            )
        cache[name] = vals
    return cache[name]


_OPS = {
    "==": np.equal, "!=": np.not_equal, "<": np.less,
    "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal,
}


def accepted_runtime(dv, name: str, op: str, value) -> np.ndarray:
    """Sorted doc_ids where ``runtime_field <op> value`` — the
    engine-side predicate form, drop-in for filtered_bm25_topk."""
    if op not in _OPS:
        raise ValueError(f"unknown op {op!r}")
    vals = runtime_column(dv, name)
    return dv.doc_ids[_OPS[op](vals, value)]


def runtime_lookup(dv, name: str, doc_ids: np.ndarray) -> np.ndarray:
    """Runtime-field values for specific (existing) doc_ids."""
    vals = runtime_column(dv, name)
    pos = np.searchsorted(dv.doc_ids, np.asarray(doc_ids, dtype=np.int64))
    return vals[pos]


def terms_agg_runtime(dv, name: str) -> tuple[np.ndarray, np.ndarray]:
    """Terms aggregation over a runtime field: (values, counts) sorted
    by value — shard-local numpy unique over the cached column."""
    vals = runtime_column(dv, name)
    return np.unique(vals, return_counts=True)
