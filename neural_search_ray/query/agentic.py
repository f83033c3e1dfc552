"""Agentic search: natural-language question → planned query → execution.

Reference: query/AgenticSearchQueryBuilder.java — an ML-Commons agent
(LLM) receives the user's question plus the index schema and produces an
OpenSearch query DSL, which then executes normally. No LLM exists in
this container, so per the repo's stub policy the PLANNER is the
documented seam: a callable ``planner(question, context) -> plan dict``;
a deployment passes an LLM-backed planner, tests pass deterministic
ones, and the default raises (honest stub, like the media decode
kernel).

Plan schema (validated here, executed against IndexSearcher):

    {"type": "bm25",        "query_text": str, "k": int}
    {"type": "sparse",      "token_weights": {term: w}, "k": int}
    {"type": "hybrid",      "query_text": str, "k": int,
     "normalization": str, "combination": str, "weights": [..]}
    {"type": "filtered_bm25", "query_text": str, "k": int,
     "filter": [column, op, value]}   # doc-values predicate pushdown
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from ..analysis.analyzer import tokenize
from .engine import IndexSearcher

PLAN_TYPES = ("bm25", "sparse", "hybrid", "filtered_bm25")


def _no_planner(question: str, context: dict) -> dict:
    raise NotImplementedError(
        "agentic search requires an LLM planner; pass planner= (an "
        "ML-Commons-agent-backed callable in a real deployment)"
    )


def validate_plan(plan: dict) -> dict:
    t = plan.get("type")
    if t not in PLAN_TYPES:
        raise ValueError(f"unknown plan type {t!r}; one of {PLAN_TYPES}")
    if t in ("bm25", "hybrid", "filtered_bm25") and not plan.get("query_text"):
        raise ValueError(f"plan type {t!r} requires query_text")
    if t == "sparse" and not plan.get("token_weights"):
        raise ValueError("plan type 'sparse' requires token_weights")
    if t == "filtered_bm25":
        f = plan.get("filter")
        if not (isinstance(f, (list, tuple)) and len(f) == 3):
            raise ValueError("filtered_bm25 requires filter=[column, op, value]")
    return plan


def agentic_search(
    searcher: IndexSearcher,
    question: str,
    planner: Callable[[str, dict], dict] = _no_planner,
) -> tuple[np.ndarray, np.ndarray, dict]:
    """Plan with the (model-backed) planner, validate, execute. Returns
    (doc_ids, scores, plan) — the plan is surfaced for explainability,
    like the reference's agent steps summary."""
    context = {
        "n_docs": searcher.n_docs,
        "avgdl": searcher.avgdl,
        "num_shards": searcher.manifest.num_doc_shards,
    }
    plan = validate_plan(planner(question, context))
    k = int(plan.get("k", 10))
    t = plan["type"]
    if t == "bm25":
        docs, scores = searcher.search_bm25(tokenize(plan["query_text"]), k=k)
    elif t == "sparse":
        docs, scores = searcher.search_sparse_dot(plan["token_weights"], k=k)
    elif t == "filtered_bm25":
        from .sparse import filtered_bm25_topk_pred

        col, op, val = plan["filter"]
        docs, scores = filtered_bm25_topk_pred(
            searcher, tokenize(plan["query_text"]), k, col, op, val
        )
    else:  # hybrid
        from ..rank.hybrid import hybrid_rank

        terms = sorted(set(tokenize(plan["query_text"])))
        subs = [
            searcher.search_bm25(terms, k=k),
            searcher.search_sparse_dot({t_: 1.0 for t_ in terms}, k=k),
        ]
        docs, scores = hybrid_rank(
            subs,
            normalization=plan.get("normalization", "min_max"),
            combination=plan.get("combination", "arithmetic_mean"),
            weights=plan.get("weights"),
            k=k,
        )
    return docs, scores, plan
