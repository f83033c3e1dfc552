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
    # head-K monoid before the distributed sort: each batch contributes
    # at most `size` candidate rows, so the exchange moves
    # O(size x blocks) rows, never the qualifying remainder (same shape
    # as the ES|QL SORT|LIMIT compile and suite.blockwise_topk)
    order = [
        (c, "descending" if d == "desc" else "ascending")
        for c, d in sort_keys
    ]

    def headk(batch: pa.Table) -> pa.Table:
        return batch.sort_by(order).slice(0, size)

    return ds.map_batches(headk, batch_format="pyarrow").sort(
        [c for c, _ in sort_keys],
        descending=[d == "desc" for _, d in sort_keys],
    ).limit(size)


def sliced_pages(
    ds: "ray.data.Dataset",
    id_col: str,
    n_slices: int,
    sort_keys: list[tuple[str, str]],
    size: int,
    pages: int,
) -> "ray.data.Dataset":
    """Sliced scroll (the _search?scroll ``slice`` API): partition the
    stream into ``n_slices`` deterministic slices and page each slice
    INDEPENDENTLY — the parallel-export surface (one consumer per slice,
    no coordination; OpenSearch's SliceBuilder). Slice membership here
    is ``id % n_slices`` — a documented deviation from the reference's
    murmur3-of-_id, pinned by the oracle (any deterministic id hash
    partitions correctly; modulo is SQL-exact).

    Returns the first ``pages`` pages of every slice as rows
    (slice_id, page, rank, id) with rank 1-based within the slice —
    page p of slice s is exactly what ``search_after`` would serve that
    slice's consumer, so a real scroll continues from any page's last
    key with the keyset machinery above.

    Scale shape: a per-batch per-slice top-(size·pages) PRUNE runs
    inside map_batches (each block contributes at most
    n_slices·size·pages candidate rows), then one groupby(slice)
    exchange of the pruned candidates and a final per-slice sort +
    truncate in map_groups — the whole stream is never globally sorted
    and the exchange is bounded by slices × page budget × blocks."""
    if n_slices < 1 or size < 1 or pages < 1:
        raise ValueError("n_slices, size, pages must all be >= 1")
    budget = size * pages
    cols = [id_col] + [c for c, _ in sort_keys if c != id_col]
    desc = [d == "desc" for _, d in sort_keys]

    def _order(batch: pa.Table) -> np.ndarray:
        ks = []
        for (c, _), dsc in zip(reversed(sort_keys), reversed(desc)):
            v = batch[c].to_numpy(zero_copy_only=False)
            if dsc:
                # datetime64/timedelta64 have no negative ufunc — the
                # int64 epoch view orders identically
                if v.dtype.kind in "mM":
                    v = v.view(np.int64)
                v = -v
            ks.append(v)
        return np.lexsort(tuple(ks))

    def prune(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        sl = (
            batch[id_col].to_numpy(zero_copy_only=False) % n_slices
        ).astype(np.int64)
        order = _order(batch)
        # within sort order, keep the first `budget` rows of each slice
        sl_o = sl[order]
        pos = np.empty(sl_o.size, dtype=np.int64)
        for s in range(n_slices):
            m = sl_o == s
            pos[m] = np.arange(int(m.sum()))
        keep = order[pos < budget]
        out = batch.take(pa.array(keep))
        return out.append_column("slice_id", pa.array(sl[keep]))

    def page_group(group: pa.Table) -> pa.Table:
        order = _order(group)[:budget]
        out = group.take(pa.array(order))
        rank = np.arange(1, len(out) + 1, dtype=np.int64)
        return pa.table(
            {
                "slice_id": out["slice_id"],
                "page": pa.array((rank - 1) // size + 1),
                "rank": pa.array(rank),
                id_col: out[id_col],
            }
        )

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("slice_id")
        .map_groups(page_group, batch_format="pyarrow")
    )


def keyset_after_scores(
    doc_ids: np.ndarray,
    scores: np.ndarray,
    cursor: tuple[float, int] | None,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """search_after over a (score desc, doc_id asc) ranking — the
    BM25-paging keyset: keep hits strictly after the cursor
    (score < cur_score, or equal score and doc_id > cur_doc), then the
    next ``k`` in ranking order. Operates on whatever score precision
    the collector ranks with (the suite passes 6dp-rounded scores, its
    cross-engine tie discipline)."""
    docs = np.asarray(doc_ids, dtype=np.int64)
    sc = np.asarray(scores, dtype=np.float64)
    order = np.lexsort((docs, -sc))
    docs, sc = docs[order], sc[order]
    if cursor is not None:
        cs, cd = float(cursor[0]), int(cursor[1])
        keep = (sc < cs) | ((sc == cs) & (docs > cd))
        docs, sc = docs[keep], sc[keep]
    return docs[:k], sc[:k]
