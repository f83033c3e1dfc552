"""Scripted-metric aggregation, Ray-Data-first.

OpenSearch's ``scripted_metric`` agg (ScriptedMetricAggregator.java in
the server the reference plugin extends) lets a user supply four
scripts — init / map (per doc) / combine (per shard) / reduce (across
shards) — producing an arbitrary metric the stock aggs can't express,
under one contract: the per-shard state must merge associatively.

Ray restatement of the same contract:

- **map+combine fuse per batch**: an Arrow batch IS a mini-shard, so
  the map script runs vectorized over the batch's columns and emits one
  opaque combined state per (batch, group) — never per row;
- states ship as pickled ``binary`` partial rows through ONE hash
  exchange on the group key (the same binary-sketch-partial shape as
  agg/sketches.py — a few bytes per (block, key) regardless of rows);
- the reduce script folds states in ``map_groups`` / at the
  coordinator.

Because the state is opaque to the engine, re-execution safety is the
script author's obligation (associative combine), exactly as in the
OpenSearch contract. Scripts are plain Python callables registered in
``SCRIPTED_METRICS`` — the extension-surface analogue of the plugin's
script-engine registry.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import pyarrow as pa

import ray.data

__all__ = ["ScriptedMetric", "SCRIPTED_METRICS", "scripted_metric_by_key"]


def _round_half_up(x, decimals: int = 6):
    x = np.asarray(x, dtype=np.float64)
    f = 10.0**decimals
    return np.floor(x * f + 0.5) / f


@dataclass(frozen=True)
class ScriptedMetric:
    """The four scripts, vectorized.

    ``map_batch`` sees a dict of numpy column arrays (one mini-shard)
    and returns an opaque state; ``combine`` folds a non-empty list of
    states into one; ``reduce`` turns the final state into a flat dict
    of named scalar outputs (the agg result document). ``columns`` is
    the exact set of fields the map script reads — the engine prunes
    the read/lookup to these.
    """

    columns: tuple[str, ...]
    map_batch: Callable[[dict[str, np.ndarray]], Any]
    combine: Callable[[list[Any]], Any]
    reduce: Callable[[Any], dict[str, Any]]
    # outputs in emit order, so Arrow schemas are stable across groups
    output_fields: tuple[str, ...] = field(default=())


def _clipped_sum(field_name: str, cap: int) -> ScriptedMetric:
    """sum(min(v, cap)) — a budgeted total no stock agg expresses.

    All-int64 state so single-node, distributed, and SQL oracle agree
    bitwise (no float association anywhere)."""
    cap = int(cap)

    def map_batch(cols: dict[str, np.ndarray]) -> tuple[int, int]:
        v = cols[field_name].astype(np.int64)
        return int(np.minimum(v, cap).sum()), int(v.size)

    def combine(states: list[tuple[int, int]]) -> tuple[int, int]:
        return sum(s[0] for s in states), sum(s[1] for s in states)

    def reduce(state: tuple[int, int]) -> dict[str, Any]:
        return {"clipped_sum": state[0], "doc_count": state[1]}

    return ScriptedMetric(
        (field_name,), map_batch, combine, reduce,
        ("clipped_sum", "doc_count"),
    )


def _rms_cents(field_name: str) -> ScriptedMetric:
    """Root-mean-square of a float field, exactly.

    The map script quantizes to integer cents (round-half-up, the
    repo-wide tie discipline), so the running sum-of-squares is exact
    int arithmetic — the one float division + sqrt happens once in
    reduce, making distributed == single-node == SQL bit-identical
    regardless of merge order."""

    def map_batch(cols: dict[str, np.ndarray]) -> tuple[int, int]:
        cents = _round_half_up(
            cols[field_name].astype(np.float64) * 100.0, 0
        ).astype(np.int64)
        return int((cents * cents).sum()), int(cents.size)

    def combine(states: list[tuple[int, int]]) -> tuple[int, int]:
        return sum(s[0] for s in states), sum(s[1] for s in states)

    def reduce(state: tuple[int, int]) -> dict[str, Any]:
        sum_sq, n = state
        rms = float(_round_half_up(np.sqrt(sum_sq / n) / 100.0, 6))
        return {"doc_count": n, "rms": rms}

    return ScriptedMetric(
        (field_name,), map_batch, combine, reduce, ("doc_count", "rms")
    )


# name -> factory(**params) -> ScriptedMetric; extension surface
SCRIPTED_METRICS: dict[str, Callable[..., ScriptedMetric]] = {
    "clipped_sum": _clipped_sum,
    "rms_cents": _rms_cents,
}


def scripted_metric_by_key(
    ds: "ray.data.Dataset", key: str, script: ScriptedMetric
) -> "ray.data.Dataset":
    """Dataset path: one scripted-metric result row per ``key`` group.

    Per batch: one sort + boundary split (O(N log N), no per-key scan),
    one map+combine state per (batch, key) pickled into a binary
    partial row; ONE exchange hash-partitioned on ``key``; reduce in
    ``map_groups``. Output: ``key, *script.output_fields``."""
    import pyarrow.compute as pc

    cols = list(script.columns)

    def partial(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch[key])
        st = batch.take(order)
        keys = np.asarray(st[key].to_pylist(), dtype=object)
        if keys.size == 0:
            return pa.table(
                {key: pa.array([], pa.string()),
                 "state": pa.array([], pa.binary())}
            )
        data = {
            c: st[c].to_numpy(zero_copy_only=False) for c in cols
        }
        bounds = np.flatnonzero(keys[1:] != keys[:-1]) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [keys.size]))
        out_keys, out_states = [], []
        for s, e in zip(starts, ends):
            out_keys.append(keys[s])
            state = script.map_batch({c: data[c][s:e] for c in cols})
            out_states.append(pickle.dumps(state, protocol=4))
        return pa.table(
            {key: pa.array(out_keys), "state": pa.array(out_states, pa.binary())}
        )

    def finish(group: pa.Table) -> pa.Table:
        states = [pickle.loads(b) for b in group["state"].to_pylist()]
        result = script.reduce(script.combine(states))
        out = {key: group[key][:1]}
        for f in script.output_fields:
            out[f] = pa.array([result[f]])
        return pa.table(out)

    return (
        ds.select_columns([key, *cols])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(finish, batch_format="pyarrow")
    )
