"""Search templates: the `_search/template` / `_render/template` API.

ES/OpenSearch stores search templates as Mustache sources; a search
request supplies `params`, the template renders to a JSON search body,
and the body executes like any query. The reference reaches this through
the OpenSearch script service (same registry seam as the reference's
processors). Restated here with a deterministic Mustache SUBSET —
documented below — and a dispatcher onto the engine's existing query
methods, so a rendered template is bit-identical to calling the target
query directly.

Mustache subset (the parts ES templates actually use):

- ``{{var}}`` / ``{{a.b}}`` — variable interpolation (dotted path into
  nested dicts); missing variables render as "" (Mustache's standard
  behavior, which is what makes the default idiom below work).
- ``{{#name}}...{{/name}}`` — section: rendered when ``name`` is truthy;
  if the value is a LIST, the body renders once per element with the
  element as the context (``{{.}}`` for the element itself).
- ``{{^name}}...{{/name}}`` — inverted section: rendered when ``name``
  is falsy/missing — with the plain section this gives the
  ``{{size}}{{^size}}10{{/size}}`` default-value idiom.
- No partials, no lambdas, no HTML escaping (search bodies are JSON,
  ES mustache runs in "no-escape" mode for them).

Scale note: rendering is per-REQUEST (tiny strings), never per-row; the
dispatched query then runs the engine's normal distributed paths.
"""

from __future__ import annotations

import json
import re

import numpy as np

_TAG = re.compile(r"\{\{([#^/]?)\s*([^}]*?)\s*\}\}")


def _lookup(path: str, stack: list) -> object:
    if path == ".":
        return stack[-1]
    for frame in reversed(stack):
        cur = frame
        ok = True
        for part in path.split("."):
            if isinstance(cur, dict) and part in cur:
                cur = cur[part]
            else:
                ok = False
                break
        if ok:
            return cur
    return None


def render_template(source: str, params: dict | None = None) -> str:
    """Render the Mustache subset against ``params``. Raises ValueError
    on unbalanced sections (a template bug, not a data condition)."""
    params = params or {}

    def render(tokens: list, stack: list) -> str:
        out: list[str] = []
        i = 0
        while i < len(tokens):
            kind, payload = tokens[i]
            if kind == "text":
                out.append(payload)
            elif kind == "var":
                v = _lookup(payload, stack)
                if v is None or v is False:
                    pass
                elif isinstance(v, bool):
                    out.append("true" if v else "false")
                else:
                    out.append(str(v))
            else:  # ("section", (negated, name, subtokens))
                negated, name, sub = payload
                v = _lookup(name, stack)
                # falsy: None / False / "" / empty list-dict. A number 0
                # is TRUTHY (and interpolates as "0") — keeps the
                # {{size}}{{^size}}default{{/size}} idiom single-valued
                # for every numeric input.
                truthy = not (
                    v is None
                    or v is False
                    or (isinstance(v, (str, list, tuple, dict)) and not v)
                )
                if negated:
                    if not truthy:
                        out.append(render(sub, stack))
                elif truthy:
                    if isinstance(v, (list, tuple, np.ndarray)):
                        for item in v:
                            out.append(render(sub, stack + [item]))
                    else:
                        out.append(render(sub, stack + [v]))
            i += 1
        return "".join(out)

    # tokenize into nested sections
    def parse(pos: int, closing: str | None) -> tuple[list, int]:
        tokens: list = []
        while True:
            m = _TAG.search(source, pos)
            if m is None:
                if closing is not None:
                    raise ValueError(f"unclosed section {closing!r}")
                tokens.append(("text", source[pos:]))
                return tokens, len(source)
            tokens.append(("text", source[pos : m.start()]))
            sigil, name = m.group(1), m.group(2)
            pos = m.end()
            if sigil == "/":
                if name != closing:
                    raise ValueError(
                        f"section close mismatch: {name!r} vs {closing!r}"
                    )
                return tokens, pos
            if sigil in ("#", "^"):
                sub, pos = parse(pos, name)
                tokens.append(("section", (sigil == "^", name, sub)))
            else:
                tokens.append(("var", name))

    tokens, _ = parse(0, None)
    return render(tokens, [params])


def render_search_template(source: str, params: dict | None = None) -> dict:
    """Render then parse — the `_render/template` API."""
    rendered = render_template(source, params)
    try:
        return json.loads(rendered)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"template rendered to invalid JSON: {e}; rendered={rendered!r}"
        ) from e


def search_template(
    searcher,
    source: str,
    params: dict | None = None,
    *,
    default_size: int = 10,
) -> tuple[np.ndarray, np.ndarray]:
    """`_search/template`: render, then dispatch the body onto the
    engine. Supported body subset (each key maps to the engine method
    whose semantics are already oracle-pinned): ``query.match`` →
    search_bm25, ``query.match_phrase`` → search_phrase, ``query.term``
    → single-term search_bm25, plus top-level ``size``."""
    body = render_search_template(source, params)
    if not isinstance(body, dict) or "query" not in body:
        raise ValueError("template body must contain a 'query' object")
    size = int(body.get("size", default_size))
    return dispatch_query(searcher, body["query"], k=size)


def dispatch_query(
    searcher, q: dict, k: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """Execute a single-clause query body against the engine — the
    shared DSL seam used by search templates and the retriever tree.
    Clause → engine method (each already oracle-pinned): match →
    search_bm25, match_phrase → search_phrase, term → single-term
    search_bm25."""
    from ..analysis.analyzer import tokenize

    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError("exactly one query clause supported")
    kind, spec = next(iter(q.items()))
    if kind == "match":
        ((_, text),) = spec.items()
        return searcher.search_bm25(tokenize(str(text)), k=k)
    if kind == "match_phrase":
        ((_, text),) = spec.items()
        return searcher.search_phrase(tokenize(str(text)), k=k)
    if kind == "term":
        ((_, value),) = spec.items()
        return searcher.search_bm25([str(value)], k=k)
    raise ValueError(f"unsupported template query clause {kind!r}")
