"""Collapse: group hits by a field, keep the best n per group, then re-rank.

Re-specified from the reference's hybrid collapse
(search/collector/HybridCollapsingTopDocsCollector.java,
processor/collapse/CollapseExecutor.java:13-37): per collapse-field value
keep ``docs_per_group`` best hits (score desc, doc_id asc), then the
global ordering over survivors.

Distributed form for big result tables:
``ds.groupby(field).map_groups(top_n_per_group)``; the numpy form here is
for driver-side k-sized result sets.
"""

from __future__ import annotations

import numpy as np


def collapse_top_docs(
    doc_ids: np.ndarray,
    scores: np.ndarray,
    field_values: np.ndarray,
    docs_per_group: int = 1,
    k: int | None = None,
):
    """Returns (doc_ids, scores, field_values) of survivors, ranked
    (score desc, doc_id asc)."""
    order = np.lexsort((doc_ids, -np.asarray(scores, dtype=np.float64)))
    seen: dict = {}
    keep: list[int] = []
    for idx in order:
        fv = field_values[idx]
        c = seen.get(fv, 0)
        if c < docs_per_group:
            seen[fv] = c + 1
            keep.append(idx)
        if k is not None and len(keep) >= k:
            break
    keep_arr = np.asarray(keep, dtype=np.int64)
    return doc_ids[keep_arr], np.asarray(scores)[keep_arr], field_values[keep_arr]


def collapse_inner_hits(
    doc_ids: np.ndarray,
    scores: np.ndarray,
    field_values: np.ndarray,
    k: int = 3,
    inner_size: int = 3,
):
    """Collapse with ``inner_hits`` (the ES/OpenSearch collapse option):
    pick the top-``k`` group HEADS (best hit per distinct field value,
    ranked score desc / doc_id asc — exactly ``collapse_top_docs`` with
    docs_per_group=1), and for each surviving group return its top
    ``inner_size`` hits in the same order.

    Returns ``[(field_value, head_rank, inner_docs, inner_scores)]``
    with groups in head order; inner lists include the head itself
    (ES returns the head in inner_hits too).
    """
    heads_d, heads_s, heads_fv = collapse_top_docs(
        doc_ids, scores, field_values, docs_per_group=1, k=k
    )
    order = np.lexsort((doc_ids, -np.asarray(scores, dtype=np.float64)))
    out = []
    for rank, fv in enumerate(heads_fv, start=1):
        mask = field_values[order] == fv
        idx = order[mask][:inner_size]
        out.append(
            (fv, rank, doc_ids[idx], np.asarray(scores)[idx])
        )
    return out
