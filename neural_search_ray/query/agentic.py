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


FILTER_OPS = ("==", "!=", "<", "<=", ">", ">=")


def validate_plan(plan: dict) -> dict:
    """Schema gate between the (untrusted, model-produced) plan and the
    engine: every field the executor reads is type- and range-checked
    here, so a malformed LLM emission fails loudly at the seam instead
    of deep inside a scorer."""
    if not isinstance(plan, dict):
        raise ValueError(f"plan must be a dict, got {type(plan).__name__}")
    t = plan.get("type")
    if t not in PLAN_TYPES:
        raise ValueError(f"unknown plan type {t!r}; one of {PLAN_TYPES}")
    k = plan.get("k", 10)
    if not isinstance(k, int) or isinstance(k, bool) or k < 1:
        raise ValueError(f"plan k must be a positive int, got {k!r}")
    if t in ("bm25", "hybrid", "filtered_bm25"):
        qt = plan.get("query_text")
        if not isinstance(qt, str) or not qt:
            raise ValueError(f"plan type {t!r} requires a non-empty query_text string")
    if t == "sparse":
        tw = plan.get("token_weights")
        if not isinstance(tw, dict) or not tw:
            raise ValueError("plan type 'sparse' requires token_weights")
        for term, w in tw.items():
            if not isinstance(term, str) or not isinstance(w, (int, float)) \
                    or isinstance(w, bool):
                raise ValueError(
                    f"token_weights must map str -> number, got {term!r}: {w!r}"
                )
    if t == "filtered_bm25":
        f = plan.get("filter")
        if not (isinstance(f, (list, tuple)) and len(f) == 3):
            raise ValueError("filtered_bm25 requires filter=[column, op, value]")
        col, op, _ = f
        if not isinstance(col, str):
            raise ValueError(f"filter column must be a string, got {col!r}")
        if op not in FILTER_OPS:
            raise ValueError(f"filter op {op!r} not one of {FILTER_OPS}")
    if t == "hybrid":
        from ..rank.combine import COMBINATION_TECHNIQUES
        from ..rank.normalize import NORMALIZATION_TECHNIQUES

        norm = plan.get("normalization", "min_max")
        if norm not in NORMALIZATION_TECHNIQUES:
            raise ValueError(
                f"unknown normalization {norm!r}; "
                f"one of {sorted(NORMALIZATION_TECHNIQUES)}"
            )
        comb = plan.get("combination", "arithmetic_mean")
        if comb not in COMBINATION_TECHNIQUES:
            raise ValueError(
                f"unknown combination {comb!r}; "
                f"one of {sorted(COMBINATION_TECHNIQUES)}"
            )
        w = plan.get("weights")
        if w is not None:
            if not isinstance(w, (list, tuple)) or len(w) != 2 or not all(
                isinstance(x, (int, float)) and not isinstance(x, bool) for x in w
            ):
                raise ValueError(
                    "hybrid weights must be a list of 2 numbers "
                    "(one per sub-query), got " + repr(w)
                )
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
