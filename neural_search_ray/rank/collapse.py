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
