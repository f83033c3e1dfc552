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

One round = a distributed hash join (edge source → its label) + a
groupby-min; rounds until fixpoint (monotone non-increasing label sums,
so equal consecutive sums == converged). Rounds needed = graph diameter
— near-dup graphs are short chains/cliques, so a handful. Everything
shuffles (node, label) scalars; no driver-side graph materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def connected_components(
    pairs: "ray.data.Dataset",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 50,
    num_partitions: int = 4,
) -> "ray.data.Dataset":
    """→ Dataset(doc_id, component) for every node appearing in a pair;
    component = min doc_id reachable (the group representative)."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate((a, b))),
                "dst": pa.array(np.concatenate((b, a))),
            }
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["dst"], "label": batch["dst"]})

    labels = (
        edges.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .min("label")
        .rename_columns(["node", "label"])
        .materialize()
    )
    prev_sum = None
    for _ in range(max_iters):
        # messages: each edge src forwards its label to dst
        msgs = edges.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b["dst"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .min("label")
            .rename_columns(["node", "label"])
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
