"""Hybrid query execution: N sub-queries → per-subquery top-k →
normalize → combine → final ranked list.

The Ray restatement of the reference's hybrid path (SURVEY.md §2.9/§2.10):
HybridQuery runs sub-queries independently keeping per-subquery TopDocs
(query/HybridQuery.java:35-84, search/collector/HybridTopScoreDocCollector.java),
then the normalization-processor's coordinator reduce normalizes per
subquery ACROSS shards and combines per doc
(processor/NormalizationProcessorWorkflow.java:66-124,
processor/combination/ScoreCombiner.java:66-130).

Here sub-query results are small (query_id, doc_id, score) tables (per
query already merged across partitions), so the reduce is driver-side
numpy — the same shape as the reference's coordinator step.
"""

from __future__ import annotations

import numpy as np

from .combine import COMBINATION_TECHNIQUES
from .normalize import NORMALIZATION_TECHNIQUES, norm_rrf


def hybrid_rank(
    subquery_results: list[tuple[np.ndarray, np.ndarray]],
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights=None,
    k: int = 10,
    rank_constant: int = 60,
    explain: bool = False,
    lower_bounds: list[dict | None] | None = None,
    upper_bounds: list[dict | None] | None = None,
):
    """Normalize + combine sub-query results for ONE query.

    subquery_results: list of (doc_ids, scores) per sub-query.
    Returns (doc_ids, combined_scores) top-k by (score desc, doc_id asc).

    ``lower_bounds`` / ``upper_bounds`` (min_max only): one bound dict —
    {"mode": "apply"|"clip"|"ignore", "min_score"/"max_score": f} — or
    None PER SUB-QUERY (MinMaxScoreNormalizationTechnique.java:75-120);
    a list length mismatch raises, like the reference.

    ``explain=True`` additionally returns a per-hit provenance list (the
    ExplanationResponseProcessor analogue,
    processor/ExplanationResponseProcessor.java:1-161): for each returned
    doc, raw + normalized score per sub-query plus the technique names.
    """
    for bounds in (lower_bounds, upper_bounds):
        if bounds is not None and len(bounds) != len(subquery_results):
            raise ValueError(
                "expected bounds array to contain "
                f"{len(subquery_results)} elements matching the number of "
                "sub-queries, but found a mismatch"
            )
    n_sub = len(subquery_results)
    all_docs = np.unique(
        np.concatenate([d for d, _ in subquery_results if d.size] or [np.empty(0, np.int64)])
    )
    if all_docs.size == 0:
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        return (*empty, []) if explain else empty
    matrix = np.full((all_docs.size, n_sub), np.nan)
    raw_matrix = np.full((all_docs.size, n_sub), np.nan)
    for j, (docs, scores) in enumerate(subquery_results):
        if docs.size == 0:
            continue
        if normalization == "rrf":
            normed = norm_rrf(scores, docs, rank_constant)
        elif normalization == "min_max" and (lower_bounds or upper_bounds):
            from .normalize import norm_min_max_bounded

            normed = norm_min_max_bounded(
                scores,
                lower_bounds[j] if lower_bounds else None,
                upper_bounds[j] if upper_bounds else None,
            )
        else:
            normed = NORMALIZATION_TECHNIQUES[normalization](scores)
        pos = np.searchsorted(all_docs, docs)
        matrix[pos, j] = normed
        raw_matrix[pos, j] = scores
    combined = COMBINATION_TECHNIQUES[combination](matrix, weights)
    order = np.lexsort((all_docs, -combined))[:k]
    result = (all_docs[order], combined[order])
    if not explain:
        return result
    explanations = [
        {
            "doc_id": int(all_docs[i]),
            "normalization": normalization,
            "combination": combination,
            "subqueries": [
                {
                    "raw_score": None if np.isnan(raw_matrix[i, j]) else float(raw_matrix[i, j]),
                    "normalized_score": None if np.isnan(matrix[i, j]) else float(matrix[i, j]),
                }
                for j in range(n_sub)
            ],
        }
        for i in order
    ]
    return (*result, explanations)


def hybrid_rank_field_sorted(
    subquery_results: list[tuple[np.ndarray, np.ndarray]],
    field_values_of,
    descending: bool = True,
    k: int = 10,
    normalization: str = "min_max",
    combination: str = "arithmetic_mean",
    weights=None,
    rank_constant: int = 60,
):
    """Hybrid FIELD-SORT collector
    (search/collector/HybridTopFieldDocSortCollector.java): the matched
    union is collected top-k by a document FIELD (ties: doc_id asc), not
    by the combined score; the combined score is still computed and
    reported per hit.

    ``field_values_of(doc_ids) -> np.ndarray`` is the doc-values lookup
    (engine-side, IndexSearcher.field_values).

    Returns (doc_ids, field_values, combined_scores) in page order.
    """
    # rank by combined score over the full union first (k = union size)
    union = np.unique(
        np.concatenate(
            [d for d, _ in subquery_results if d.size] or [np.empty(0, np.int64)]
        )
    )
    if union.size == 0:
        return (np.empty(0, np.int64), np.empty(0), np.empty(0, np.float64))
    docs, scores = hybrid_rank(
        subquery_results, normalization, combination, weights,
        k=union.size, rank_constant=rank_constant,
    )
    fv = np.asarray(field_values_of(docs))
    order = np.lexsort((docs, -fv if descending else fv))[:k]
    return docs[order], fv[order], scores[order]
