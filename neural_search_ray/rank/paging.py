"""search_after / keyset pagination over a sorted result stream.

Reference: search/collector/PagingFieldCollector.java — each page
re-runs the query but skips every hit whose sort key is at-or-before the
previous page's last key (the search_after key), instead of a deep
offset. The collector compares (sort field values, then docID) with the
per-field sort direction.

Ray restatement: the keyset predicate is evaluated INSIDE ``map_batches``
(vectorized, per block — so deep pages never ship the skipped prefix to
the sort), then a distributed ``ds.sort(...).limit(size)`` produces the
page. At scale this is the resumable-scan shape: page N+1's cost is the
filter scan plus a top-``size`` sort of the qualifying remainder, not an
offset-(N·size) materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _after_mask(batch: pa.Table, sort_keys: list[tuple[str, str]], after: list) -> np.ndarray:
    """Vectorized lexicographic 'strictly after the key' test.

    A row qualifies when (k1, k2, ...) sorts strictly AFTER the ``after``
    tuple under the per-key directions: k1 beyond a1, or k1 == a1 and
    (k2... beyond) recursively — PagingFieldCollector's per-doc
    compare, vectorized over the block.
    """
    n = batch.num_rows
    qualifies = np.zeros(n, dtype=bool)
    tied = np.ones(n, dtype=bool)
    for (col, direction), a in zip(sort_keys, after):
        v = batch[col].to_numpy(zero_copy_only=False)
        beyond = (v < a) if direction == "desc" else (v > a)
        qualifies |= tied & beyond
        tied &= v == a
    return qualifies  # rows tied on EVERY key are not after (excluded)


def search_after(
    ds: "ray.data.Dataset",
    sort_keys: list[tuple[str, str]],
    after: list | None,
    size: int,
) -> "ray.data.Dataset":
    """One keyset page: rows strictly after ``after`` (None = first
    page), sorted by ``sort_keys`` [(column, 'asc'|'desc'), ...], limited
    to ``size``. The last row of a page is the next page's ``after``."""
    if after is not None:
        if len(after) != len(sort_keys):
            raise ValueError("after key must match sort_keys length")

        def fil(batch: pa.Table) -> pa.Table:
            return batch.filter(pa.array(_after_mask(batch, sort_keys, after)))

        ds = ds.map_batches(fil, batch_format="pyarrow")
    return ds.sort(
        [c for c, _ in sort_keys],
        descending=[d == "desc" for _, d in sort_keys],
    ).limit(size)
