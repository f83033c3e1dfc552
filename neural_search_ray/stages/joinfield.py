"""Parent-child join-field queries (the OpenSearch ``join`` datatype).

Reference restatement: OpenSearch's join field colocates parent and
child docs in one index and serves ``has_child`` (match parents by an
inner query over their children, score_mode none/min/max/sum/avg),
``has_parent`` (match children whose parent satisfies a query, score
optionally inherited), and ``inner_hits`` (the top matching children
attached to each returned parent). Lucene executes these with a
global-ordinals join per segment; the neural-search reference composes
them with its hybrid/rerank processors unchanged.

Ray-native restatement: two Datasets (parent table, child table) keyed
by the parent key. ``has_child`` pre-aggregates children per batch —
one partial row per (parent key, batch) carrying (sum, count, min,
max), so EVERY score_mode rides one partial schema — then one
groupby(key) exchange merges partials and applies the mode +
min/max_children gate, and the small per-parent result joins back to
the parent stream (hash join capped by runtime.join_partitions, or a
ray.put broadcast when the matched-parent map is small). The child
stream is never globally sorted and unmatched children never leave
their block.

Scale shape: the exchange carries at most (#parents-with-matching-
children × #blocks) partial rows, not child rows; ``inner_hits``
prunes each block to its per-parent top-``size`` before its single
groupby, the sliced-scroll trick (rank/paging.py sliced_pages).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_MODES = ("none", "min", "max", "sum", "avg")


def _partials(
    key_col: str, score_col: str
) -> "callable[[pa.Table], pa.Table]":
    """Per-batch combiner: one (key, sum, cnt, min, max) row per
    distinct parent key in the batch. Sort + reduceat — no per-row
    Python."""

    def combine(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = batch[score_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        order = np.argsort(keys, kind="stable")
        ks, ss = keys[order], sc[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        cnt = np.diff(np.r_[starts, ks.size])
        return pa.table(
            {
                key_col: pa.array(ks[starts], pa.int64()),
                "_sum": pa.array(np.add.reduceat(ss, starts)),
                "_cnt": pa.array(cnt.astype(np.int64)),
                "_min": pa.array(np.minimum.reduceat(ss, starts)),
                "_max": pa.array(np.maximum.reduceat(ss, starts)),
            }
        )

    return combine


def child_scores(
    children: "ray.data.Dataset",
    *,
    key_col: str,
    score_col: str,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
) -> "ray.data.Dataset":
    """The per-parent half of ``has_child``: aggregate the (already
    inner-query-filtered) child stream to one (key, child_score,
    n_children) row per parent key that passes the min/max_children
    gate. score_mode ``none`` scores every gated parent 1.0
    (constant-score, the OpenSearch default)."""
    if score_mode not in _MODES:
        raise ValueError(f"score_mode must be one of {_MODES}")
    if min_children < 1:
        raise ValueError("min_children must be >= 1")
    n_buckets = 64

    def bucket(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__b", pa.array((keys % n_buckets).astype(np.int32))
        )

    # one map_groups call per BUCKET (<= n_buckets), each merging all
    # of its keys vectorized — never one Python call per parent key
    def merge_bucket(group: pa.Table) -> pa.Table:
        keys = group[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        cnt = np.add.reduceat(
            group["_cnt"].to_numpy(zero_copy_only=False)[order], starts
        )
        s = np.add.reduceat(
            group["_sum"].to_numpy(zero_copy_only=False)[order], starts
        )
        if score_mode == "sum":
            score = s
        elif score_mode == "avg":
            score = s / cnt
        elif score_mode == "min":
            score = np.minimum.reduceat(
                group["_min"].to_numpy(zero_copy_only=False)[order], starts
            )
        elif score_mode == "max":
            score = np.maximum.reduceat(
                group["_max"].to_numpy(zero_copy_only=False)[order], starts
            )
        else:  # none
            score = np.ones(starts.size, dtype=np.float64)
        keep = cnt >= min_children
        if max_children is not None:
            keep &= cnt <= max_children
        return pa.table(
            {
                key_col: pa.array(ks[starts][keep], pa.int64()),
                "child_score": pa.array(score[keep].astype(np.float64)),
                "n_children": pa.array(cnt[keep].astype(np.int64)),
            }
        )

    return (
        children.map_batches(
            _partials(key_col, score_col), batch_format="pyarrow"
        )
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def has_child(
    parents: "ray.data.Dataset",
    children: "ray.data.Dataset",
    *,
    parent_key: str,
    child_key: str,
    score_col: str,
    score_mode: str = "max",
    min_children: int = 1,
    max_children: int | None = None,
    num_partitions: int = 64,
    broadcast: bool = False,
) -> "ray.data.Dataset":
    """has_child query: parents that have >= min_children (and <=
    max_children, if set) children in the already-filtered ``children``
    stream, with the mode-combined child score and the child count
    attached. Inner-join semantics: non-matching parents drop out.

    ``broadcast=True`` ships the per-parent agg map (one row per parent
    WITH matching children — often tiny after the inner query) once via
    ray.put and attaches it inside map_batches over the parent stream —
    zero shuffle, the asof_join_broadcast precedent. Default False =
    hash join, for when the matched-parent map itself is huge."""
    agg = child_scores(
        children,
        key_col=child_key,
        score_col=score_col,
        score_mode=score_mode,
        min_children=min_children,
        max_children=max_children,
    )
    if broadcast:
        # bounded by #parents-with-matching-children; drop the
        # schemaless empty blocks Ray emits for empty groups
        tabs = [t for t in ray.get(agg.to_arrow_refs()) if t.num_columns]
        if tabs:
            t = pa.concat_tables(tabs)
            keys = (
                t[child_key].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            order = np.argsort(keys, kind="stable")
            payload = (
                keys[order],
                t["child_score"].to_numpy(zero_copy_only=False)[order],
                t["n_children"].to_numpy(zero_copy_only=False)[order],
            )
        else:
            payload = (
                np.empty(0, np.int64),
                np.empty(0, np.float64),
                np.empty(0, np.int64),
            )
        ref = ray.put(payload)

        def attach(batch: pa.Table) -> pa.Table:
            pk, sc, nc = ray.get(ref)
            out_empty = batch.slice(0, 0).append_column(
                "child_score", pa.array([], pa.float64())
            ).append_column("n_children", pa.array([], pa.int64()))
            if pk.size == 0:
                return out_empty
            ids = (
                batch[parent_key]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            idx = np.minimum(np.searchsorted(pk, ids), pk.size - 1)
            hit = pk[idx] == ids
            kept = batch.filter(pa.array(hit))
            return kept.append_column(
                "child_score", pa.array(sc[idx[hit]], pa.float64())
            ).append_column(
                "n_children", pa.array(nc[idx[hit]], pa.int64())
            )

        return parents.map_batches(attach, batch_format="pyarrow")
    from ..runtime import join_partitions

    # Dataset.join drops the right-side key column from the output
    return parents.join(
        agg,
        "inner",
        num_partitions=join_partitions(num_partitions),
        on=(parent_key,),
        right_on=(child_key,),
    )


def has_parent(
    children: "ray.data.Dataset",
    matched_parents: pa.Table,
    *,
    parent_key: str,
    child_key: str,
    parent_score_col: str | None = None,
    score: bool = True,
) -> "ray.data.Dataset":
    """has_parent query, broadcast form: ``matched_parents`` is the
    parent query's (small) result — (key, score) pairs — shipped ONCE
    via ray.put; every child batch keeps the rows whose parent is in
    the set and inherits the parent score via one searchsorted (or 1.0
    when ``score=False``, the OpenSearch default). The child stream
    never shuffles. For a huge matched-parent set use
    ``has_child``'s join path with sides swapped."""
    keys = matched_parents[parent_key].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    if score:
        if parent_score_col is None:
            raise ValueError("parent_score_col required when score=True")
        sc = (
            matched_parents[parent_score_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
    else:
        sc = np.ones(keys.size, dtype=np.float64)
    order = np.argsort(keys, kind="stable")
    ref = ray.put((keys[order], sc[order]))

    def attach(batch: pa.Table) -> pa.Table:
        pk, ps = ray.get(ref)
        empty = batch.slice(0, 0).append_column(
            "parent_score", pa.array([], pa.float64())
        )
        if pk.size == 0:
            return empty
        ck = batch[child_key].to_numpy(zero_copy_only=False).astype(np.int64)
        idx_c = np.minimum(np.searchsorted(pk, ck), pk.size - 1)
        hit = pk[idx_c] == ck
        kept = batch.filter(pa.array(hit))
        return kept.append_column(
            "parent_score", pa.array(ps[idx_c[hit]], pa.float64())
        )

    return children.map_batches(attach, batch_format="pyarrow")


def inner_hits(
    children: "ray.data.Dataset",
    parent_keys: np.ndarray,
    *,
    child_key: str,
    score_col: str,
    size: int = 3,
    tiebreak_cols: tuple[str, ...] = (),
) -> "ray.data.Dataset":
    """inner_hits: for each selected parent (a SMALL key set — the
    page of parents being returned), the top-``size`` children by
    (score desc, tiebreaks asc) with a 1-based rank. Per-batch
    per-parent prune (each block contributes <= |parents|·size
    candidate rows) then ONE groupby(key) final top-size — the
    sliced_pages shape; the child stream is never globally sorted."""
    if size < 1:
        raise ValueError("size must be >= 1")
    pset = ray.put(np.sort(np.asarray(parent_keys, dtype=np.int64)))
    cols = [child_key, score_col, *tiebreak_cols]

    def _order(batch: pa.Table) -> np.ndarray:
        ks = [
            batch[c].to_numpy(zero_copy_only=False)
            for c in reversed(tiebreak_cols)
        ]
        ks.append(
            -batch[score_col].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
        )
        return np.lexsort(tuple(ks))

    def prune(batch: pa.Table) -> pa.Table:
        pk = ray.get(pset)
        if pk.size == 0:
            return batch.slice(0, 0).select(cols)
        ck = batch[child_key].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(pk, ck), pk.size - 1)
        batch = batch.filter(pa.array(pk[idx] == ck)).select(cols)
        if len(batch) == 0:
            return batch
        order = _order(batch)
        ck2 = batch[child_key].to_numpy(zero_copy_only=False)[order]
        so = np.argsort(ck2, kind="stable")
        starts = np.flatnonzero(np.r_[True, ck2[so][1:] != ck2[so][:-1]])
        pos = np.empty(ck2.size, dtype=np.int64)
        pos[so] = np.arange(ck2.size) - np.repeat(
            starts, np.diff(np.r_[starts, ck2.size])
        )
        return batch.take(pa.array(order[pos < size]))

    def top(group: pa.Table) -> pa.Table:
        order = _order(group)[:size]
        out = group.take(pa.array(order))
        return out.append_column(
            "rank", pa.array(np.arange(1, len(out) + 1, dtype=np.int64))
        )

    return (
        children.map_batches(prune, batch_format="pyarrow")
        .groupby(child_key)
        .map_groups(top, batch_format="pyarrow")
    )


def parent_id_children(
    children: "ray.data.Dataset",
    *,
    child_key: str,
    parent_ids: list[int],
) -> "ray.data.Dataset":
    """parent_id query (OpenSearch ParentIdQueryBuilder): the child docs
    of the given parent ids — constant-score membership, the direct
    join-field lookup. A sorted id whitelist is broadcast in the closure
    (bounded by the query, not the data) and membership-tested per
    batch; the child stream never shuffles."""
    pids = np.sort(np.asarray(list(parent_ids), dtype=np.int64))

    def flt(batch: pa.Table) -> pa.Table:
        keys = batch[child_key].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        pos = np.searchsorted(pids, keys)
        pos = np.minimum(pos, pids.size - 1)
        return batch.filter(pa.array(pids[pos] == keys))

    return children.map_batches(flt, batch_format="pyarrow")
