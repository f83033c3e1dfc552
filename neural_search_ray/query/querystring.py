"""simple_query_string — the OpenSearch/Lucene SimpleQueryParser subset
restated: a tiny, never-throwing query grammar that compiles to the
engine's structured clauses (the reference exposes this surface through
OpenSearch's query DSL; its semantics are Lucene's SimpleQueryParser,
lucene/queryparser SimpleQueryParser.java).

Supported syntax (documented subset, everything else is literal text):

    term            optional clause (SHOULD)
    +term           required clause (MUST)
    -term           negated clause (MUST_NOT)
    "a b c"         phrase clause (exact adjacency, positional index)
    pre*            prefix clause (trailing ``*`` only; constant-score)

Unquoted multi-token text analyzes into one clause per token, each
carrying the same occur flag — `+new york` is `+new york`, i.e. the
flag binds to the adjacent token only, as in SimpleQueryParser.
Default operator is OR (clauses are SHOULD; a should-only query needs
at least one match). The parser never raises on user input: dangling
quotes close at end-of-string, a bare ``*``/``+``/``-`` is dropped.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# [+-]? then either a quoted run or a non-space run
_TOKEN = re.compile(r'([+-]?)("([^"]*)"?|[^\s"]+)')


@dataclass(frozen=True)
class Clause:
    occur: str  # "must" | "should" | "must_not"
    kind: str   # "term" | "phrase" | "prefix"
    payload: tuple[str, ...]  # term(s); prefix payload is the stem


def parse_query_string(qs: str, analyzer=None) -> list[Clause]:
    """Parse into clauses; ``analyzer`` tokenizes term/phrase text (the
    engine's own analyzer by default, so query analysis matches index
    analysis — the Lucene rule)."""
    if analyzer is None:
        from ..analysis.analyzer import tokenize as analyzer
    clauses: list[Clause] = []
    occur_map = {"+": "must", "-": "must_not", "": "should"}
    for m in _TOKEN.finditer(qs):
        occur = occur_map[m.group(1)]
        if m.group(3) is not None:  # quoted phrase
            toks = analyzer(m.group(3))
            if toks:
                clauses.append(Clause(occur, "phrase", tuple(toks)))
            continue
        raw = m.group(2)
        if raw.endswith("*") and len(raw) > 1 and "*" not in raw[:-1]:
            stem = raw[:-1].lower()
            if stem:
                clauses.append(Clause(occur, "prefix", (stem,)))
            continue
        for t in analyzer(raw):
            clauses.append(Clause(occur, "term", (t,)))
    return clauses
