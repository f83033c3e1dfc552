"""Retriever tree: the modern `retriever` search-request surface.

ES 8.x restructured search requests around composable retrievers: leaf
retrievers (``standard`` wrapping a query clause, ``knn``) produce
ranked lists; compound retrievers (``rrf``, ``linear``) execute their
children to a rank window and fuse them. The reference's hybrid query
is exactly the ``linear``/``rrf`` compound executed inside one request —
so this module is a thin declarative layer over the SAME oracle-pinned
machinery: `templates.dispatch_query` for leaves and `rank.hybrid
.hybrid_rank` for fusion (normalization/combination semantics unchanged,
processor/normalization/* in the reference).

Leaf/fusion cost model at scale: leaves run the engine's ordinary
distributed paths; fusion touches only the rank windows (k-sized
arrays), never the corpus.
"""

from __future__ import annotations

import numpy as np

from ..rank.hybrid import hybrid_rank
from .templates import dispatch_query

DEFAULT_RANK_WINDOW = 10


def execute_retriever(
    spec: dict,
    *,
    searcher,
    k: int = 10,
    knn_fn=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Execute a retriever tree. ``spec`` is the body of the request's
    ``retriever`` key:

    - ``{"standard": {"query": {...}}}`` — leaf; the query clause runs
      through templates.dispatch_query.
    - ``{"knn": {...}}`` — leaf; delegated to ``knn_fn(spec, k)`` (the
      dense tier is wired by the caller — brute/IVF/HNSW/PQ all fit).
    - ``{"rrf": {"retrievers": [...], "rank_constant": c,
      "rank_window_size": w}}`` — children to window w, reciprocal-rank
      fusion (hybrid_rank normalization="rrf"/combination="rrf").
    - ``{"linear": {"retrievers": [{"retriever": ..., "weight": f}...],
      "rank_window_size": w}}`` — children to window w, min_max
      normalize + weighted arithmetic-mean combine.
    """
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError("retriever spec must have exactly one type key")
    kind, body = next(iter(spec.items()))
    if kind == "standard":
        return dispatch_query(searcher, body["query"], k=k)
    if kind == "knn":
        if knn_fn is None:
            raise ValueError("knn retriever requires knn_fn")
        return knn_fn(body, k)
    if kind == "rrf":
        children = body.get("retrievers")
        if not children:
            raise ValueError("rrf retriever needs a non-empty 'retrievers'")
        window = int(body.get("rank_window_size", DEFAULT_RANK_WINDOW))
        subs = [
            execute_retriever(c, searcher=searcher, k=window, knn_fn=knn_fn)
            for c in children
        ]
        return hybrid_rank(
            subs,
            normalization="rrf",
            combination="rrf",
            k=k,
            rank_constant=int(body.get("rank_constant", 60)),
        )
    if kind == "linear":
        children = body.get("retrievers")
        if not children:
            raise ValueError("linear retriever needs a non-empty 'retrievers'")
        window = int(body.get("rank_window_size", DEFAULT_RANK_WINDOW))
        subs, weights = [], []
        for c in children:
            subs.append(
                execute_retriever(
                    c["retriever"], searcher=searcher, k=window, knn_fn=knn_fn
                )
            )
            weights.append(float(c.get("weight", 1.0)))
        total = sum(weights)
        if total <= 0:
            raise ValueError("linear retriever weights must sum > 0")
        return hybrid_rank(
            subs,
            normalization="min_max",
            combination="arithmetic_mean",
            weights=[w / total for w in weights],
            k=k,
        )
    raise ValueError(f"unknown retriever type {kind!r}")
