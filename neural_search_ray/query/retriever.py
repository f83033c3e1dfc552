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
    texts_fn=None,
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
            execute_retriever(c, searcher=searcher, k=window, knn_fn=knn_fn, texts_fn=texts_fn)
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
                    c["retriever"], searcher=searcher, k=window, knn_fn=knn_fn, texts_fn=texts_fn
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
    if kind == "rescorer":
        child = body.get("retriever")
        res = body.get("rescore")
        if child is None or res is None:
            raise ValueError("rescorer needs 'retriever' and 'rescore'")
        window = int(res.get("window_size", DEFAULT_RANK_WINDOW))
        qw = float(res.get("query_weight", 1.0))
        rqw = float(res.get("rescore_query_weight", 1.0))
        match = res.get("query", {}).get("match")
        if not match:
            # subset restriction (documented): Lucene QueryRescorer takes
            # any query; this surface pins a match clause so the rescore
            # scores come from ONE vectorized BM25 union pass
            raise ValueError("rescorer subset supports a 'match' rescore query")
        from ..analysis.analyzer import tokenize

        (field, text), = match.items()
        del field  # single-field engine; parity with the request shape
        docs, scores = execute_retriever(
            child, searcher=searcher, k=window, knn_fn=knn_fn, texts_fn=texts_fn
        )
        cand, rscores = searcher._bm25_union_scores(tokenize(text), None)
        pos = np.searchsorted(cand, docs)
        pos_c = np.minimum(pos, max(cand.size - 1, 0))
        hit = cand.size > 0
        found = (
            (cand[pos_c] == docs) if hit else np.zeros(docs.size, bool)
        )
        extra = np.where(found, rscores[pos_c] if hit else 0.0, 0.0)
        blended = qw * scores + rqw * extra
        order = np.lexsort((docs, -blended))[:k]
        return docs[order], blended[order]
    if kind == "rule":
        child = body.get("retriever")
        ruleset = body.get("ruleset")
        criteria = body.get("match_criteria")
        if child is None or ruleset is None or criteria is None:
            raise ValueError(
                "rule needs 'retriever', 'ruleset' and 'match_criteria'"
            )
        pinned: list[int] = []
        excluded: set[int] = set()
        for rule in ruleset:
            if rule.get("criteria_term") != criteria:
                continue
            for i in rule.get("pinned_ids", ()):
                if int(i) not in pinned:
                    pinned.append(int(i))
            excluded.update(int(i) for i in rule.get("excluded_ids", ()))
        # membership rule: only EXISTING docs may be pinned (matches
        # engine.search_pinned and ES pinned semantics — nonexistent
        # ids must not surface as top-ranked results)
        if pinned:
            exist, _ = searcher.search_ids(pinned, k=len(pinned))
            exist_set = set(exist.tolist())
            pinned = [i for i in pinned if i in exist_set]
        pinned = [i for i in pinned if i not in excluded][:k]
        docs, scores = execute_retriever(
            child, searcher=searcher, k=k + len(pinned) + len(excluded),
            knn_fn=knn_fn, texts_fn=texts_fn,
        )
        drop = excluded.union(pinned)
        if drop:
            keep = ~np.isin(docs, np.fromiter(drop, np.int64, len(drop)))
            docs, scores = docs[keep], scores[keep]
        docs, scores = docs[: k - len(pinned)], scores[: k - len(pinned)]
        pin_docs = np.asarray(pinned, dtype=np.int64)
        # same synthetic-score convention as engine.search_pinned:
        # pinned ids first IN ORDER, above every organic score
        pin_scores = searcher.PIN_SCORE_BASE - np.arange(
            len(pinned), dtype=np.float64
        )
        return (
            np.concatenate([pin_docs, docs]),
            np.concatenate([pin_scores, scores]),
        )
    if kind == "text_similarity_reranker":
        # ES 8.15 semantic reranker retriever: the child runs to a rank
        # window, then a similarity model re-scores (query, doc_text)
        # pairs. The model is the engine's rerank seam (rank/rerank.py —
        # deterministic token-overlap stand-in in this container, same
        # seam the rerank_rescore processor pins); ``texts_fn(doc_ids)``
        # supplies the window docs' source text (k-sized fetch).
        child = body.get("retriever")
        text = body.get("inference_text")
        if child is None or text is None:
            raise ValueError(
                "text_similarity_reranker needs 'retriever' and "
                "'inference_text'"
            )
        if texts_fn is None:
            raise ValueError("text_similarity_reranker requires texts_fn")
        window = int(body.get("rank_window_size", DEFAULT_RANK_WINDOW))
        docs, _scores = execute_retriever(
            child, searcher=searcher, k=window, knn_fn=knn_fn,
            texts_fn=texts_fn,
        )
        from ..rank.rerank import rerank_rescore

        d2, s2 = rerank_rescore(text, docs, texts_fn(docs))
        return d2[:k], s2[:k]
    raise ValueError(f"unknown retriever type {kind!r}")
