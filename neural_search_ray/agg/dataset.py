"""Ray-Data distributed cardinality / percentile aggregations.

The OpenSearch ``cardinality`` and ``percentiles`` aggs
(CardinalityAggregator / HyperLogLogPlusPlus.java,
AbstractTDigestPercentilesAggregator.java) restated as streaming Ray
Data pipelines. Two tiers each:

- **exact**: the partial+final pattern — per-batch combiner shrinks the
  stream before the one hash exchange; only (key, scalar) rows reach the
  final small groupby. ``COUNT(DISTINCT)``-exact, used as the oracle.
- **sketch**: per-batch fixed-size sketch partials (HLL registers /
  t-digest centroids) as Arrow ``binary`` payloads, merged per key in
  ``map_groups`` — the 100-TB path: state per (block, key) is a few KiB
  regardless of row count, and the merge is associative so Ray can
  re-execute tasks safely.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from .sketches import HyperLogLog, MisraGries, TDigest, hash64

__all__ = [
    "exact_distinct",
    "hll_cardinality",
    "tdigest_quantiles",
    "heavy_hitters_terms",
]


def exact_distinct(
    ds: "ray.data.Dataset", key: str, value: str
) -> "ray.data.Dataset":
    """Exact distinct-count of ``value`` per ``key`` → (key,
    distinct_count).

    One all-to-all exchange, hash-partitioned on (key, value): the
    per-batch combiner first drops duplicate pairs (web-scale streams
    are heavily repetitive, so the exchange moves unique pairs, not
    rows), the groupby dedupes globally, then per-block partial counts
    collapse through a second, tiny exchange of (key, count) scalars.
    """
    from ray.data.aggregate import Count, Sum

    def pair_dedup(batch: pa.Table) -> pa.Table:
        return batch.select([key, value]).group_by([key, value]).aggregate([])

    def per_block_count(batch: pa.Table) -> pa.Table:
        return (
            batch.select([key])
            .group_by([key])
            .aggregate([([], "count_all")])
            .rename_columns([key, "partial"])
        )

    return (
        ds.map_batches(pair_dedup, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Count(alias_name="_n"))
        .map_batches(per_block_count, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("partial", alias_name="distinct_count"))
    )


def _sorted_groups(tbl: pa.Table, key: str):
    """Yield (key_value, values_np) per key — ONE sort + boundary
    detection per batch (O(N log N)) instead of a filter scan per key
    (O(K·N), pathological for high-cardinality keys like user ids)."""
    import pyarrow.compute as pc

    order = pc.sort_indices(tbl[key])
    st = tbl.take(order)
    karr = np.asarray(st[key].to_pylist(), dtype=object)
    if karr.size == 0:
        return
    cols = {
        c: st[c].to_numpy(zero_copy_only=False)
        for c in st.column_names
        if c != key
    }
    bounds = np.flatnonzero(np.r_[True, karr[1:] != karr[:-1]])
    ends = np.r_[bounds[1:], karr.size]
    for b, e in zip(bounds.tolist(), ends.tolist()):
        yield karr[b], {c: v[b:e] for c, v in cols.items()}


def _hll_partial(key: str, value: str, p: int):
    def fn(batch: pa.Table) -> pa.Table:
        keys, sketches = [], []
        for kv, cols in _sorted_groups(batch.select([key, value]), key):
            h = HyperLogLog(p).add_hashed(hash64(cols[value]))
            keys.append(kv)
            sketches.append(h.to_bytes())
        return pa.table(
            {
                key: pa.array(keys, batch[key].type),
                "sketch": pa.array(sketches, pa.binary()),
            }
        )

    return fn


def hll_cardinality(
    ds: "ray.data.Dataset", key: str, value: str, p: int = 14
) -> "ray.data.Dataset":
    """Approximate distinct-count per key via HyperLogLog: per-batch
    register partials (2^p bytes per (block, key) — independent of row
    count), one exchange of sketches, register-max merge per key."""

    def finish(group: pa.Table) -> pa.Table:
        merged = HyperLogLog.merge_payloads(group["sketch"].to_pylist())
        return pa.table(
            {
                key: group[key][:1],
                "approx_distinct": pa.array(
                    [merged.estimate()], pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(_hll_partial(key, value, p), batch_format="pyarrow")
        .groupby(key)
        .map_groups(finish, batch_format="pyarrow")
    )


def heavy_hitters_terms(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    k: int = 100,
    top: int = 10,
) -> list[tuple[str, int]]:
    """Approximate top tokens by collection frequency via mergeable
    Misra-Gries partials: each block ships at most ``k`` (token, count)
    rows regardless of block size; the coordinator merge keeps the
    N/(k+1) error bound under any merge order. Exact whenever the true
    vocabulary fits in ``k`` (trim never fires). The exact tier for a
    bounded vocabulary is the term_stats groupby (`top_terms` oracle
    entry)."""
    import pyarrow.compute as pc

    from ..analysis.analyzer import analyze_column

    def partial(batch: pa.Table) -> pa.Table:
        lists = analyze_column(batch[text_col].combine_chunks())
        vc = pc.value_counts(lists.flatten())
        mg = MisraGries(k).add(
            np.asarray(vc.field("values").to_pylist(), dtype=object),
            vc.field("counts").to_numpy(zero_copy_only=False),
        )
        vals, counts = mg.to_items()
        return pa.table(
            {
                "token": pa.array(vals, pa.string()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = MisraGries(k)
    if rows:
        merged.add(
            np.asarray([r["token"] for r in rows], dtype=object),
            [r["c"] for r in rows],
        )
    return merged.top(top)


def heavy_hitters_by_key(
    ds: "ray.data.Dataset",
    key: str,
    text_col: str = "text",
    k: int = 100,
    top: int = 10,
) -> "ray.data.Dataset":
    """Per-key approximate top tokens via keyed Misra-Gries partials:
    each block ships ≤ k (key, token, count) rows per key value, one
    groupby(key) co-locates the partials, map_groups merges — rows →
    (key, rank, token, cf). Counts are exact whenever the per-key
    vocabulary fits ``k`` (trim never fires), N_key/(k+1)-bounded
    under-estimates otherwise."""
    from ..analysis.analyzer import analyze_column

    def partial(batch: pa.Table) -> pa.Table:
        lists = analyze_column(batch[text_col].combine_chunks())
        off = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        flat = lists.flatten()
        keys_rep = batch[key].take(
            pa.array(
                np.repeat(
                    np.arange(len(batch), dtype=np.int64), np.diff(off)
                )
            )
        )
        out_k, out_t, out_c = [], [], []
        t = pa.table({key: keys_rep, "tok": flat})
        for kv, cols in _sorted_groups(t, key):
            u, c = np.unique(cols["tok"].astype(object), return_counts=True)
            mg = MisraGries(k).add(u, c)
            vals, counts = mg.to_items()
            out_k += [kv] * len(vals)
            out_t += vals
            out_c += counts
        return pa.table(
            {
                key: pa.array(out_k, t[key].type),
                "token": pa.array(out_t, pa.string()),
                "c": pa.array(out_c, pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        mg.add(
            np.asarray(group["token"].to_pylist(), dtype=object),
            group["c"].to_numpy(zero_copy_only=False),
        )
        items = mg.top(top)
        return pa.table(
            {
                key: pa.concat_arrays(
                    [group[key][:1].combine_chunks()] * len(items)
                ),
                "rank": pa.array(
                    range(1, len(items) + 1), pa.int64()
                ),
                "term": pa.array([t for t, _ in items], pa.string()),
                "cf": pa.array([c for _, c in items], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(finish, batch_format="pyarrow")
    )


def tdigest_quantiles(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    delta: float = 200.0,
) -> "ray.data.Dataset":
    """Approximate per-key quantiles via merging t-digests: per-batch
    centroid partials as binary payloads, merged per key in map_groups
    → (key, q, value) rows."""

    def partial(batch: pa.Table) -> pa.Table:
        keys, payloads = [], []
        for kv, cols in _sorted_groups(batch.select([key, value]), key):
            keys.append(kv)
            payloads.append(
                TDigest(delta).add(cols[value].astype(np.float64)).to_bytes()
            )
        return pa.table(
            {
                key: pa.array(keys, batch[key].type),
                "sketch": pa.array(payloads, pa.binary()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        t = TDigest.from_bytes(group["sketch"][0].as_py())
        for b in group["sketch"][1:]:
            t.merge(TDigest.from_bytes(b.as_py()))
        est = t.quantiles(qs)
        return pa.table(
            {
                key: pa.concat_arrays(
                    [group[key][:1].combine_chunks()] * len(qs)
                ),
                "q": pa.array(list(qs), pa.float64()),
                "value": pa.array(est, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(finish, batch_format="pyarrow")
    )
