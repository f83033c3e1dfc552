"""frequent_item_sets aggregation (size-2 tier).

Public-surface analogue: Elasticsearch's ``frequent_item_sets``
aggregation (8.x, the FP-growth-backed co-occurrence miner) — exposed
by the host distribution alongside the reference plugin's own aggs.
This module implements the exact 2-itemset tier with a-priori
pruning; deeper itemsets extend the same shape (candidate generation
from frequent (k-1)-sets) and are out of scope here.

Semantics (pinned, SQL-mirrorable): items = distinct analyzer terms
per document; an itemset {a, b} (a < b lexicographically) has
support = number of documents containing BOTH; report itemsets with
support >= min_support, top-K by (support desc, a asc, b asc).

Scale shape:
* **a-priori prune at the read**: only terms whose df >= min_support
  can appear in a frequent pair, so the qualifying-term universe
  (usually tiny vs the vocabulary) is resolved by ONE df pass —
  reusing the exact partial+final pattern of term_stats — and
  broadcast via ``ray.put`` as a sorted numpy array; each batch probes
  it with searchsorted, never a shuffle join.
* **pair explosion is per-doc bounded**: C(q, 2) pairs per doc where q
  counts only qualifying distinct terms; the per-batch combiner
  (Arrow group-by over pair codes) collapses duplicates before the
  single (a, b)-keyed exchange.
* the final itemset table is bounded by the frequent-pair universe,
  not the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["frequent_item_sets"]


def _qualifying_terms(docs_ds, analyzer_cfg, min_support: int) -> np.ndarray:
    """df >= min_support term universe: analyze + per-batch distinct
    (term, doc) partial counts, one groupby(term) sum — the term_stats
    shape — materialized only to the (small) qualifying list."""
    import ray
    from ray.data.aggregate import Sum

    from ..analysis.analyzer import analyze_column

    def partial(batch: pa.Table) -> pa.Table:
        lists = analyze_column(batch["text"], analyzer_cfg)
        n = len(batch)
        counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), counts
        )
        t = pa.table({"term": lists.flatten(), "doc_id": pa.array(doc_ids)})
        # distinct per doc, then per-batch df partial
        dd = pa.TableGroupBy(t, ["term", "doc_id"]).aggregate([])
        g = pa.TableGroupBy(dd, ["term"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["term", "df_p"])

    agg = (
        docs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
    )
    rows = agg.take_all()
    terms = np.array(
        sorted(r["term"] for r in rows if r["df"] >= min_support),
        dtype=object,
    )
    return terms


def frequent_item_sets(
    docs_ds_factory,
    *,
    min_support: int,
    size: int = 10,
    analyzer_cfg=None,
):
    """Mine frequent 2-itemsets over the documents' analyzer terms.

    ``docs_ds_factory`` is a zero-arg callable returning a fresh
    Dataset of (doc_id, text) — the input streams twice (df pass, pair
    pass), so the caller supplies the lineage, not a consumed dataset.

    Returns a pyarrow.Table (item_a, item_b, support) — top ``size`` by
    (support desc, item_a, item_b).
    """
    import ray
    from ray.data.aggregate import Sum

    from ..analysis.analyzer import analyze_column
    from ..config import AnalyzerConfig

    cfg = analyzer_cfg or AnalyzerConfig()
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    universe = _qualifying_terms(docs_ds_factory(), cfg, min_support)
    if universe.size < 2:
        return pa.table({
            "item_a": pa.array([], pa.string()),
            "item_b": pa.array([], pa.string()),
            "support": pa.array([], pa.int64()),
        })
    uref = ray.put(universe)
    n_items = universe.size

    def pair_partial(batch: pa.Table, _uref=uref) -> pa.Table:
        uni = ray.get(_uref)
        lists = analyze_column(batch["text"], cfg)
        counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        wdoc = np.repeat(np.arange(len(batch)), counts)
        # probe the broadcast universe with ONE Arrow index_in kernel:
        # qualifying tokens -> item codes, everything else -> null
        code_arr = pc.index_in(
            lists.flatten(), value_set=pa.array(uni, pa.string())
        )
        ok = pc.is_valid(code_arr).to_numpy(zero_copy_only=False)
        codes = code_arr.to_numpy(zero_copy_only=False)[ok].astype(np.int64)
        docs = wdoc[ok]
        if codes.size == 0:
            return pa.table({
                "pair": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            })
        # distinct (doc, code), doc-major order
        key = docs * n_items + codes
        key = np.unique(key)
        docs, codes = key // n_items, key % n_items
        # per-doc pair generation, fully vectorized: for doc runs of
        # length L, emit all (i < j) index pairs via repeat/arange
        run_starts = np.flatnonzero(
            np.concatenate([[True], docs[1:] != docs[:-1]])
        )
        run_lens = np.diff(np.concatenate([run_starts, [docs.size]]))
        # first element of each pair: position p repeated (end - p - 1)
        ends = np.repeat(run_starts + run_lens, run_lens)
        reps = ends - np.arange(docs.size) - 1
        left = np.repeat(np.arange(docs.size), reps)
        total = int(reps.sum())
        if total == 0:
            return pa.table({
                "pair": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            })
        # second element: left position + 1, +2, ... within the run
        offs = np.arange(total) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        right = left + 1 + offs
        pair_code = codes[left] * n_items + codes[right]
        uniq, cnt = np.unique(pair_code, return_counts=True)
        return pa.table({
            "pair": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = (
        docs_ds_factory()
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("cnt", alias_name="support"))
    )

    rows = agg.take_all()  # bounded by the frequent-pair universe
    pairs = np.array([r["pair"] for r in rows], dtype=np.int64)
    support = np.array([r["support"] for r in rows], dtype=np.int64)
    keep = support >= min_support
    pairs, support = pairs[keep], support[keep]
    a, b = pairs // n_items, pairs % n_items
    ta = universe[a]
    tb = universe[b]
    order = np.lexsort((tb, ta, -support))[:size]
    return pa.table({
        "item_a": pa.array(ta[order].tolist(), pa.string()),
        "item_b": pa.array(tb[order].tolist(), pa.string()),
        "support": pa.array(support[order], pa.int64()),
    })
