"""Dotted-key (un)flattening — the reference's ingest-document field
mapping (neural-search consumes OpenSearch ingest documents whose
processors address nested fields by dotted paths; MappingUtils /
unflattening in the ingest chain).

Ray/Arrow restatement: a batch with dotted COLUMN names ("a.b", "a.c")
becomes one struct column per top-level prefix; ``flatten_structs`` is
the inverse (struct columns → dotted columns). Both are pure Arrow
metadata/layout operations — no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa


def unflatten_dict(d: dict) -> dict:
    """{"a.b": 1, "a.c": 2, "x": 3} → {"a": {"b": 1, "c": 2}, "x": 3}."""
    out: dict = {}
    for key, val in d.items():
        parts = key.split(".")
        cur = out
        for p in parts[:-1]:
            nxt = cur.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                cur[p] = nxt
            cur = nxt
        cur[parts[-1]] = val
    return out


def flatten_dict(d: dict, prefix: str = "") -> dict:
    """Inverse of unflatten_dict (nested dicts → dotted keys)."""
    out: dict = {}
    for key, val in d.items():
        full = f"{prefix}{key}"
        if isinstance(val, dict):
            out.update(flatten_dict(val, full + "."))
        else:
            out[full] = val
    return out


def unflatten_batch(batch: pa.Table) -> pa.Table:
    """Dotted column names → struct columns, grouped by first segment.
    Non-dotted columns pass through unchanged; column order: pass-through
    columns first (original order), then struct groups (name order)."""
    plain: list[tuple[str, pa.ChunkedArray]] = []
    groups: dict[str, list[tuple[str, pa.ChunkedArray]]] = {}
    for name in batch.column_names:
        col = batch[name]
        if "." in name:
            head, rest = name.split(".", 1)
            groups.setdefault(head, []).append((rest, col))
        else:
            plain.append((name, col))
    arrays = [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
              for _, c in plain]
    names = [n for n, _ in plain]
    for head in sorted(groups):
        fields = groups[head]
        child_arrays = []
        for _, c in fields:
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            child_arrays.append(c)
        arrays.append(
            pa.StructArray.from_arrays(child_arrays, names=[n for n, _ in fields])
        )
        names.append(head)
    return pa.table(dict(zip(names, arrays)))


def flatten_batch(batch: pa.Table) -> pa.Table:
    """Struct columns → dotted columns (one level; nested structs keep
    flattening recursively)."""
    out_names: list[str] = []
    out_arrays: list[pa.Array] = []

    def emit(name: str, col):
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_struct(col.type):
            for f in col.type:
                emit(f"{name}.{f.name}", col.field(f.name))
        else:
            out_names.append(name)
            out_arrays.append(col)

    for name in batch.column_names:
        emit(name, batch[name])
    return pa.table(dict(zip(out_names, out_arrays)))
