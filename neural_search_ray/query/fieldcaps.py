"""_field_caps API (ES field capabilities introspection).

Returns, per field, its type and which operations the engine can serve
on it — merged across the three field sources this engine has: the
indexed text field (postings), the doc-values sidecar columns
(filter/sort/agg), and registered runtime fields (computed at query
time).  The reference's host exposes the same API over its mapping
registry; here the "mapping" IS the index layout, so capabilities are
derived, not declared.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["field_caps"]

_ARROW_TYPE_NAMES = [
    (pa.types.is_string, "keyword"),
    (pa.types.is_integer, "long"),
    (pa.types.is_floating, "double"),
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_timestamp, "date"),
]


def _type_name(t: pa.DataType) -> str:
    for pred, name in _ARROW_TYPE_NAMES:
        if pred(t):
            return name
    return str(t)


def field_caps(searcher) -> dict[str, dict]:
    """Capabilities map: field -> {type, searchable, aggregatable,
    filterable, source} (source: "index" | "doc_values" | "runtime")."""
    caps: dict[str, dict] = {
        "text": {
            "type": "text",
            "searchable": True,       # postings + BM25
            "aggregatable": False,    # no fielddata equivalent
            "filterable": False,
            "source": "index",
        }
    }
    try:
        dv = searcher.doc_values()
    except FileNotFoundError:
        dv = None
    if dv is not None:
        for name in dv.table.column_names:
            if name == "doc_id":
                continue
            caps[name] = {
                "type": _type_name(dv.table.schema.field(name).type),
                "searchable": False,
                "aggregatable": True,
                "filterable": True,
                "source": "doc_values",
            }
    from .runtime_fields import RUNTIME_FIELDS

    for name, (cols, _kernel) in RUNTIME_FIELDS.items():
        caps[name] = {
            "type": "runtime",
            "searchable": False,
            "aggregatable": True,
            "filterable": True,
            "source": "runtime",
            "depends_on": list(cols),
        }
    return caps
