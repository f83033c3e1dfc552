"""Semantic highlighting: wrap the most query-relevant fragment of a hit
document in <em> tags.

Reference: highlight/SemanticHighlighter.java (+ extractor/
SentenceHighlightingRequest) — an ML model scores SENTENCES of the hit
text against the query and the top sentence(s) are wrapped in
pre/post tags. No model weights exist in this container, so the scorer
seam follows the repo's stub policy: the default fragment scorer is
DISTINCT-QUERY-TERM OVERLAP (a deterministic, oracle-expressible
stand-in); a deployment passes a model-backed scorer callable
(fragments, query) -> scores without touching the pipeline.

Fragmentation: sentences (runs ending in .!?) when the text has
sentence punctuation; fixed ``window``-token fragments otherwise (the
synthetic corpus has no punctuation, and window mode is what the SQL
oracle reproduces). Tie-break: earliest fragment. Zero overlap → text
returned unchanged (the reference returns no highlight field).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import numpy as np
import pyarrow as pa

PRE_TAG = "<em>"
POST_TAG = "</em>"
DEFAULT_WINDOW = 20

_SENT_END = re.compile(r"(?<=[.!?])\s+")


def overlap_scorer(fragments: list[list[str]], query_terms: set[str]) -> np.ndarray:
    """Default fragment scorer: count of DISTINCT query terms present
    (case-normalized by the caller)."""
    return np.fromiter(
        (len(query_terms & set(f)) for f in fragments),
        dtype=np.int64,
        count=len(fragments),
    )


def make_weighted_scorer(weight_of: dict[str, int]) -> Callable:
    """Term-weighted fragment scorer: sum of per-term integer weights
    over the DISTINCT query terms present. With weights =
    round(bm25_idf·1e6) this is classic idf-weighted passage scoring
    (the principled form of the reference's model-scored sentences —
    rare query terms dominate fragment choice instead of counting 'the'
    as heavily as the rare term). Integer weights keep cross-engine
    (numpy vs SQL) sums exact, so the oracle can pin the winner."""

    def scorer(fragments: list[list[str]], query_terms: set[str]) -> np.ndarray:
        return np.fromiter(
            (
                sum(weight_of.get(t, 0) for t in (query_terms & set(f)))
                for f in fragments
            ),
            dtype=np.int64,
            count=len(fragments),
        )

    return scorer


def highlight_text(
    query_terms: set[str],
    text: str,
    window: int = DEFAULT_WINDOW,
    pre_tag: str = PRE_TAG,
    post_tag: str = POST_TAG,
    scorer: Callable | None = None,
) -> tuple[str, int]:
    """→ (highlighted text, best fragment score). Unchanged text when no
    fragment scores > 0."""
    if not text:
        return text, 0
    scorer = scorer or overlap_scorer
    if _SENT_END.search(text):
        # sentence mode: fragments are the sentence substrings
        spans: list[tuple[int, int]] = []
        start = 0
        for m in _SENT_END.finditer(text):
            spans.append((start, m.start()))
            start = m.end()
        if start < len(text):
            spans.append((start, len(text)))
        from ..analysis.analyzer import _WORD_RE

        # analyzer-normalized fragment tokens (punctuation stripped, so
        # "query." matches the query term "query"); window mode below
        # keeps raw space-split tokens to stay byte-identical with the
        # SQL oracle on the single-space corpus
        frags = [_WORD_RE.findall(text[s:e].lower()) for s, e in spans]
        scores = np.asarray(scorer(frags, query_terms))
        best = int(np.argmax(scores))  # ties → earliest
        if scores[best] <= 0:
            return text, 0
        s, e = spans[best]
        return (
            text[:s] + pre_tag + text[s:e] + post_tag + text[e:],
            int(scores[best]),
        )
    # window mode (no sentence punctuation): fixed token windows
    toks = text.split(" ")
    n = len(toks)
    starts = list(range(0, n, window))
    frags = [toks[s : s + window] for s in starts]
    scores = np.asarray(scorer(frags, query_terms))
    best = int(np.argmax(scores))
    if scores[best] <= 0:
        return text, 0
    s = starts[best]
    e = min(s + window, n)
    out = []
    if s > 0:
        out.append(" ".join(toks[:s]) + " ")
    out.append(pre_tag + " ".join(toks[s:e]) + post_tag)
    if e < n:
        out.append(" " + " ".join(toks[e:]))
    return "".join(out), int(scores[best])


class SemanticHighlightStage:
    """map_batches callable: rows (query_id, doc_id, text, query_text) →
    + highlighted column. Actor-pool form for pipelines; the suite calls
    highlight_text directly on its k-sized hit tables."""

    def __init__(self, window: int = DEFAULT_WINDOW, scorer: Callable | None = None):
        from ..analysis.analyzer import tokenize

        self._tokenize = tokenize
        self.window = window
        self.scorer = scorer

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for text, qtext in zip(
            batch["text"].to_pylist(), batch["query_text"].to_pylist()
        ):
            terms = set(self._tokenize(qtext or ""))
            out.append(
                highlight_text(terms, text or "", self.window, scorer=self.scorer)[0]
            )
        return batch.append_column("highlighted", pa.array(out, type=pa.string()))
