"""Nested documents (OpenSearch nested field type / Lucene block join).

Reference restatement: OpenSearch maps a ``nested`` field to hidden
child Lucene documents indexed in the same block as the parent;
``nested`` queries run against the children and join back to the parent
with a ``score_mode`` (sum/max/avg/none) via ToParentBlockJoinQuery;
``nested`` aggregations step down into the child scope and
``reverse_nested`` steps back up to count parents. The neural-search
reference composes these from core unchanged.

Ray-native restatement: nested objects are a ``list<struct>`` column —
children stay physically co-located with their parent row (the block
invariant), so every operator here is an embarrassingly parallel
``map_batches`` over flattened child arrays:

- ``nested_query``: flatten children once per batch
  (``ListArray.flatten`` + ``value_parent_indices`` — zero-copy), apply
  ALL conditions to the SAME child (the semantics a flattened/object
  mapping gets wrong), fold matching-child scores to the parent with
  ``score_mode`` via ``np.bincount`` / ``np.maximum.at``, then the
  per-batch tie-aware top-k prune + bounded driver merge (the
  geo_distance_topk pattern).
- ``nested_terms_agg``: child-scope terms agg — per-batch unique
  partials, one (key)-groupby exchange.
- ``reverse_nested_count``: per-batch DISTINCT (key, parent) pairs
  (each parent row lives in exactly one batch, so batch-local dedup is
  globally exact), then the same partial-count exchange.

The test tables carry no nested columns, so ``add_nested_column``
derives deterministic children from the integer id — pure int64
arithmetic (n = id%3+1 children; author = 'u' + (id*7+i*3)%20,
stars = (id*13+i*5)%6), identical in numpy and SQL, documented here as
the fixture contract.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

SCORE_MODES = ("sum", "max", "avg", "none")


def add_nested_column(
    ds: "ray.data.Dataset", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Attach a deterministic ``comments: list<struct<author,stars>>``
    column derived from the id — the nested fixture."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = ids % 3 + 1
        offsets = np.zeros(ids.size + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        parent = np.repeat(np.arange(ids.size), counts)
        i = np.arange(offsets[-1], dtype=np.int64) - offsets[:-1][parent]
        pid = ids[parent]
        author_num = (pid * 7 + i * 3) % 20
        stars = (pid * 13 + i * 5) % 6
        authors = np.char.add("u", author_num.astype(np.str_))
        struct = pa.StructArray.from_arrays(
            [
                pa.array(authors.tolist(), pa.string()),
                pa.array(stars, pa.int64()),
            ],
            names=["author", "stars"],
        )
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        return batch.append_column("comments", lst)

    return ds.map_batches(attach, batch_format="pyarrow")


def _flatten(batch: pa.Table, nested_col: str):
    """(parent_row_idx, author dict-codes ndarray, author dictionary
    list, stars ndarray) of every child — zero-copy list flatten +
    parent indices; the string key is dictionary-encoded once per batch
    so every downstream op works on small ints."""
    col = batch[nested_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten()
    parent = col.value_parent_indices().to_numpy(zero_copy_only=False)
    enc = flat.field("author").dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = enc.dictionary.to_pylist()
    stars = flat.field("stars").to_numpy(zero_copy_only=False)
    return parent, codes, vocab, stars


def nested_query(
    ds: "ray.data.Dataset",
    *,
    author: str,
    min_stars: int,
    score_mode: str = "sum",
    k: int = 10,
    id_col: str = "doc_id",
    nested_col: str = "comments",
) -> pa.Table:
    """nested query: parents with ≥1 child satisfying ALL conditions
    (author == X AND stars >= Y on the SAME child object), parent score
    folded from matching-child stars by ``score_mode``; top-k by
    (score desc, id asc). Per-batch fold + tie-aware top-k prune, then
    one k×blocks-bounded driver merge."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"unknown score_mode: {score_mode}")
    if k < 1:
        raise ValueError("k must be >= 1")

    def fold(batch: pa.Table) -> pa.Table:
        parent, codes, vocab, stars = _flatten(batch, nested_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        want = vocab.index(author) if author in vocab else -1
        m = (codes == want) & (stars >= min_stars)
        n = len(batch)
        hits = np.bincount(parent[m], minlength=n)
        if score_mode == "sum":
            score = np.bincount(
                parent[m], weights=stars[m], minlength=n
            )
        elif score_mode == "max":
            score = np.full(n, -np.inf)
            np.maximum.at(score, parent[m], stars[m].astype(np.float64))
        elif score_mode == "avg":
            tot = np.bincount(parent[m], weights=stars[m], minlength=n)
            score = np.divide(
                tot, hits, out=np.zeros(n), where=hits > 0
            )
        else:  # none — constant score, filter semantics
            score = (hits > 0).astype(np.float64)
        sel = np.flatnonzero(hits > 0)
        out_ids, out_sc = ids[sel], score[sel]
        if out_ids.size > k:
            keep = np.lexsort((out_ids, -out_sc))[:k]
            out_ids, out_sc = out_ids[keep], out_sc[keep]
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "score": pa.array(out_sc, pa.float64()),
            }
        )

    cand = ds.map_batches(fold, batch_format="pyarrow").take_all()
    ids = np.asarray([r["doc_id"] for r in cand], dtype=np.int64)
    sc = np.asarray([r["score"] for r in cand], dtype=np.float64)
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order]),
            "score": pa.array(sc[order]),
        }
    )


def nested_terms_agg(
    ds: "ray.data.Dataset",
    *,
    size: int = 10,
    nested_col: str = "comments",
) -> pa.Table:
    """nested { terms } aggregation: CHILD counts per author (the agg
    runs in the child scope, so one parent with three u5 comments
    contributes 3). Per-batch unique partials, one groupby exchange,
    top ``size`` by (count desc, author asc)."""

    def partial(batch: pa.Table) -> pa.Table:
        _, codes, vocab, _ = _flatten(batch, nested_col)
        cnt = np.bincount(codes, minlength=len(vocab)).astype(np.int64)
        return pa.table(
            {
                "author": pa.array(vocab, pa.string()),
                "_cnt": pa.array(cnt),
            }
        )

    return _merge_counts(
        ds.map_batches(partial, batch_format="pyarrow"),
        "author",
        "child_count",
        size,
    )


def reverse_nested_count(
    ds: "ray.data.Dataset",
    *,
    size: int = 10,
    nested_col: str = "comments",
) -> pa.Table:
    """nested { terms { reverse_nested } } aggregation: PARENT counts
    per author (steps back up to the root scope — one parent counts
    once per author no matter how many of its comments match). Batch-
    local (author, parent) dedup is globally exact because each parent
    row lives in exactly one batch."""

    def partial(batch: pa.Table) -> pa.Table:
        parent, codes, vocab, _ = _flatten(batch, nested_col)
        nv = len(vocab)
        pairs = np.unique(parent.astype(np.int64) * nv + codes)
        cnt = np.bincount(pairs % nv, minlength=nv).astype(np.int64)
        return pa.table(
            {
                "author": pa.array(vocab, pa.string()),
                "_cnt": pa.array(cnt),
            }
        )

    return _merge_counts(
        ds.map_batches(partial, batch_format="pyarrow"),
        "author",
        "parent_count",
        size,
    )


def _merge_counts(
    partials: "ray.data.Dataset", key: str, out_col: str, size: int
) -> pa.Table:
    """(key, _cnt) partials → one groupby exchange → top ``size`` by
    (count desc, key asc) — the shared bucket-agg merge."""

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                key: group[key].slice(0, 1),
                out_col: pa.array(
                    [int(np.sum(group["_cnt"].to_numpy()))], pa.int64()
                ),
            }
        )

    rows = (
        partials.groupby(key)
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )  # one row per distinct key — bounded by the key cardinality
    ks = np.asarray([r[key] for r in rows])
    n = np.asarray([r[out_col] for r in rows], dtype=np.int64)
    order = np.lexsort((ks, -n))[:size]
    return pa.table(
        {
            key: pa.array(ks[order].tolist(), pa.string()),
            out_col: pa.array(n[order]),
        }
    )
