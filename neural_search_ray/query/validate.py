"""_validate/query API — parse-only request validation.

The ES endpoint answers "would this request parse/execute?" without
running it.  This engine has three request surfaces, each with its own
strict parser; validation dispatches to the matching one and reports
``{"valid": bool, "error": str | None}`` without touching an index:

* ``kind="dsl"``     — query-DSL dict (templates.dispatch_query's
                       clause whitelist, checked structurally)
* ``kind="query_string"`` — the classic grammar (query/queryparser.py)
* ``kind="esql"``    — the ES|QL pipe language (query/esql.py)
"""

from __future__ import annotations

__all__ = ["validate_query"]

_DSL_CLAUSES = {
    "match", "term", "match_phrase", "prefix", "wildcard", "regexp",
    "fuzzy", "bool", "ids", "exists",
}


def _validate_dsl(body: dict) -> str | None:
    if not isinstance(body, dict):
        return "query body must be an object"
    q = body.get("query", body)
    if not isinstance(q, dict) or len(q) != 1:
        return "exactly one query clause required"
    (kind, _payload), = q.items()
    if kind not in _DSL_CLAUSES:
        return f"unsupported clause {kind!r}"
    return None


def validate_query(request, kind: str = "dsl") -> dict:
    """Validate without executing.  Never raises: parser errors come
    back as ``{"valid": False, "error": ...}``."""
    try:
        if kind == "dsl":
            err = _validate_dsl(request)
            if err:
                return {"valid": False, "error": err}
        elif kind == "query_string":
            from .queryparser import parse_query

            parse_query(request)
        elif kind == "esql":
            from .esql import parse_esql

            parse_esql(request)
        else:
            return {"valid": False, "error": f"unknown kind {kind!r}"}
    except Exception as e:  # strict parsers raise typed ValueErrors
        return {"valid": False, "error": str(e)}
    return {"valid": True, "error": None}
