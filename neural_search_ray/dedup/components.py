"""Connected components over near-duplicate candidate pairs —
the keep-first-representative step of a dedup pipeline.

Near-dup operators (MinHash-LSH, SimHash, embedding cosine) emit PAIRS;
choosing one representative per duplicate GROUP requires the transitive
closure: components of the pair graph, representative = min doc_id of
the component (the deterministic "keep first" policy, same tie rule as
dedup/exact.py).

Ray restatement — iterative min-label propagation (the standard BSP /
"hash-to-min" shape, Rastogi et al. ICDE'13), each round expressed in
Dataset ops:

    labels(v) := v
    repeat: labels(v) := min(labels(v), min_{(u,v) in E} labels(u))

One round = TWO salted-bucket sort shuffles (no hash-join operator —
measured ~7 s/round fixed setup for Dataset.join at 32 cpus vs ~2 s for
a groupby):

1. co-locate each node's label row with the edge rows sourced at that
   node (groupby(key % B)), gather label-per-edge via a vectorized
   searchsorted, emit (dst, label) messages plus the label row itself;
2. groupby(node % B) + segmented ``np.minimum.reduceat`` computes the
   new per-node min label.

Rounds until fixpoint (labels monotone non-increasing, so equal
consecutive label sums == converged). Rounds needed = graph diameter —
near-dup graphs are short chains/cliques, so a handful. Everything
shuffles (node, label) scalars; group count per shuffle is bounded by
the salt-bucket count, and no stage materializes the graph driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

NUM_LABEL_BUCKETS = 256


def _min_by_node(group: pa.Table) -> pa.Table:
    """Vectorized per-node min label over one salt bucket."""
    node = group["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    label = group["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    if node.size == 0:
        return pa.table(
            {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    order = np.lexsort((label, node))
    node, label = node[order], label[order]
    new = np.empty(node.size, dtype=bool)
    new[0] = True
    new[1:] = node[1:] != node[:-1]
    starts = np.flatnonzero(new)
    return pa.table(
        {
            "node": pa.array(node[starts]),
            "label": pa.array(np.minimum.reduceat(label, starts)),
        }
    )


def _local_components(batch: pa.Table) -> pa.Table:
    """Whole (small) edge set in ONE task: index-space min-label
    propagation with pointer-jumping path compression — O(E) numpy per
    round, O(log n) rounds. Node ids sorted ascending means min INDEX
    label == min doc_id representative, the same policy as the BSP
    path."""
    src = batch["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = batch["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    if src.size == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}
        )
    nodes, inv = np.unique(np.concatenate((src, dst)), return_inverse=True)
    ia, ib = inv[: src.size], inv[src.size :]
    lab = np.arange(nodes.size, dtype=np.int64)
    while True:
        prev = lab
        m = np.minimum(lab[ia], lab[ib])
        lab = lab.copy()
        np.minimum.at(lab, ia, m)
        np.minimum.at(lab, ib, m)
        lab = lab[lab]  # pointer jumping: halve remaining chain depth
        if np.array_equal(lab, prev):
            break
    return pa.table(
        {"doc_id": pa.array(nodes), "component": pa.array(nodes[lab])}
    )


LOCAL_CC_MAX_EDGES = 5_000_000


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
    num_buckets: int = NUM_LABEL_BUCKETS,
    local_threshold: int = LOCAL_CC_MAX_EDGES,
) -> "ray.data.Dataset":
    """→ Dataset(doc_id, component) for every node appearing in a pair;
    component = min doc_id reachable (the group representative).

    Two-mode: edge sets up to ``local_threshold`` (symmetrized rows;
    ~16 B/row, so the default caps one task at ~80 MB of edges) solve in
    a SINGLE vectorized task (_local_components) — the iterative BSP
    rounds below each cost several Ray stages of fixed overhead, which
    dominates small graphs (measured 13 s → ~1 s on the sf0.1 dedup
    entry). Larger graphs take the salted BSP path unchanged. Near-dup
    graphs are far smaller than their corpora (pairs, not docs), so even
    100-TB corpora often fit the local path after LSH bucketing; the BSP
    path is the guarantee, not the common case."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate((a, b))
        return pa.table(
            {
                "kbucket": pa.array(src % num_buckets),
                "src": pa.array(src),
                "dst": pa.array(np.concatenate((b, a))),
            }
        )

    # edges stay hash-bucketed by src for every round
    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()
    # Right-size block count to the DATA (rows / ~2M per block): upstream
    # candidate generators emit shuffle-width block counts (~200 near-empty
    # blocks at small scale), and every iterative round would re-pay a task
    # per block; at large scale rows/2M keeps blocks near the object-store
    # target. Measured: 30 s → 8 s for the sf0.1 dedup_components entry.
    n_edges = edges.count()
    if n_edges <= local_threshold:
        return edges.repartition(1).map_batches(
            _local_components, batch_size=None, batch_format="pyarrow"
        )
    target_blocks = max(1, min(edges.num_blocks(), -(-n_edges // 2_000_000)))
    if edges.num_blocks() > 4 * target_blocks:
        edges = edges.repartition(target_blocks).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"nbucket": pa.array(dst % num_buckets), "node": batch["dst"], "label": batch["dst"]}
        )

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("nbucket")
        .map_groups(_min_by_node, batch_format="pyarrow")
        .repartition(target_blocks)
        .materialize()
    )

    def tag_label_rows(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "kbucket": pa.array(node % num_buckets),
                "src": batch["node"],
                "dst": pa.array(np.full(node.size, -1, dtype=np.int64)),
                "label": batch["label"],
            }
        )

    def tag_edge_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "kbucket": batch["kbucket"],
                "src": batch["src"],
                "dst": batch["dst"],
                "label": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64)
                ),
            }
        )

    def send_messages(group: pa.Table) -> pa.Table:
        """One salt bucket: label rows (dst == -1) carry label(src);
        edge rows gather it via searchsorted and forward to dst. Also
        re-emits each label row so the next min keeps the old label."""
        src = group["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = group["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = group["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_label = dst == -1
        lnode = src[is_label]
        llab = lab[is_label]
        lorder = np.argsort(lnode)
        lnode, llab = lnode[lorder], llab[lorder]
        e_src = src[~is_label]
        e_dst = dst[~is_label]
        pos = np.searchsorted(lnode, e_src)
        # every edge src has a label row by construction — fail LOUDLY if
        # that invariant ever breaks (e.g. a caller filtered the labels
        # dataset) instead of gathering a wrong neighbor's label
        if e_src.size and not (
            (pos < lnode.size).all() and (lnode[np.minimum(pos, lnode.size - 1)] == e_src).all()
        ):
            raise AssertionError(
                "connected-components invariant broken: edge src without a "
                "label row in its bucket (labels dataset was filtered?)"
            )
        e_lab = llab[pos]
        node = np.concatenate((e_dst, lnode))
        label = np.concatenate((e_lab, llab))
        return pa.table(
            {
                "nbucket": pa.array(node % num_buckets),
                "node": pa.array(node),
                "label": pa.array(label),
            }
        )

    prev_sum = None
    for _ in range(max_iters):
        tagged = edges.map_batches(tag_edge_rows, batch_format="pyarrow").union(
            labels.map_batches(tag_label_rows, batch_format="pyarrow")
        )
        labels = (
            tagged.groupby("kbucket")
            .map_groups(send_messages, batch_format="pyarrow")
            .groupby("nbucket")
            .map_groups(_min_by_node, batch_format="pyarrow")
            .repartition(target_blocks)  # collapse shuffle-width block spam
            .materialize()
        )
        cur = labels.sum("label")
        cur_sum = cur if isinstance(cur, (int, float)) else cur["sum(label)"]
        if cur_sum == prev_sum:
            break  # monotone non-increasing → equal sums = fixpoint
        prev_sum = cur_sum

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch["node"], "component": batch["label"]}
        )

    return labels.map_batches(finish, batch_format="pyarrow")


APPLY_BROADCAST_MAX_DROPS = 5_000_000


def apply_dedup(
    corpus: "ray.data.Dataset",
    components: "ray.data.Dataset",
    id_col: str = "doc_id",
    num_partitions: int = 16,
    broadcast_threshold: int = APPLY_BROADCAST_MAX_DROPS,
) -> "ray.data.Dataset":
    """Keep-first near-dup REMOVAL: the last step of the dedup pipeline.

    A doc survives iff it has no near-dup component (never appeared in a
    candidate pair) or it IS its component's representative (the min
    label — keep-first).

    Two-mode, like connected_components: when the DROP set (non-
    representative members) fits ``broadcast_threshold`` rows (~8 B/row,
    so the default caps the broadcast at ~40 MB), it is ray.put once and
    every corpus batch filters with one sorted-membership searchsorted —
    the corpus side NEVER moves, which is the whole point at 100 TB.
    A drop set beyond the threshold (dup-heavy corpus) streams the
    corpus through a distributed left-outer hash join instead. The
    broadcast mode pulls at most ``broadcast_threshold`` ids through the
    driver to build the array (bounded by construction); the join mode
    never touches the driver."""
    import pyarrow.compute as pc

    import ray

    drops_tbl = components.map_batches(
        lambda b: b.filter(
            pc.not_equal(b["doc_id"], b["component"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    n_drops = drops_tbl.count()
    if n_drops <= broadcast_threshold:
        drop_ids = np.sort(
            np.concatenate(
                [
                    b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                    for b in drops_tbl.iter_batches(batch_format="pyarrow")
                ]
                or [np.empty(0, np.int64)]
            )
        )
        drop_ref = ray.put(drop_ids)

        def drop_members(batch: pa.Table) -> pa.Table:
            drops = ray.get(drop_ref)  # zero-copy object-store read
            if drops.size == 0:
                return batch
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(drops, ids)
            hit = (pos < drops.size) & (drops[np.minimum(pos, drops.size - 1)] == ids)
            return batch.filter(pa.array(~hit))

        return corpus.map_batches(drop_members, batch_format="pyarrow")

    def comp_keyed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: batch["doc_id"], "component": batch["component"]}
        )

    from ..runtime import join_partitions

    joined = corpus.join(
        components.map_batches(comp_keyed, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=join_partitions(num_partitions),
        on=(id_col,),
    )

    def keep_survivors(batch: pa.Table) -> pa.Table:
        comp = batch["component"]
        # or_kleene, not or_: plain or_ propagates the null from
        # equal(null, id) and the filter would DROP every unmatched row
        survive = pc.or_kleene(
            pc.is_null(comp), pc.equal(comp, batch[id_col])
        )
        return batch.filter(survive).drop_columns(["component"])

    return joined.map_batches(keep_survivors, batch_format="pyarrow")
