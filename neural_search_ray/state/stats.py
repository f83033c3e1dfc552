"""Event-stat counters: the Ray analogue of the reference's stats
subsystem (stats/events/EventStatsManager.java, EventStatName.java —
timestamped event counters per operator, surfaced via the _neural/stats
endpoint).

Pattern here: each task/actor increments its own in-process registry (no
cross-process coordination — counters are task-local); stages return or
log a snapshot, and the driver SUMS snapshots (the "aggregate on
coordinator" step). ``IndexSearcher``/stages call ``stats.incr(...)``;
build manifests carry per-group counts already (n_terms/n_postings).
"""

from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class StatsRegistry:
    counters: dict[str, int] = field(default_factory=lambda: defaultdict(int))
    started_at: float = field(default_factory=time.time)

    def incr(self, name: str, by: int = 1) -> None:
        self.counters[name] += by

    def snapshot(self) -> dict[str, int]:
        return dict(self.counters)

    def merge(self, other: dict[str, int]) -> None:
        for k, v in other.items():
            self.counters[k] += v

    def reset(self) -> None:
        self.counters.clear()
        self.started_at = time.time()


# process-local default registry (one per Ray worker / driver)
stats = StatsRegistry()


def track_batch_memory(stage: str):
    """RAM accounting at partition grain (the reference's circuit-breaker
    bookkeeping analogue — sparse/cache RamBytesUsed accounting): wrap a
    map_batches fn so each batch records its Arrow buffer footprint
    (pa.Table.nbytes) in and out, per stage. Ray's object-store
    backpressure enforces the actual limit; these counters make the
    per-stage footprint observable (stats.snapshot())."""

    def wrap(fn):
        def inner(batch, *a, **kw):
            stats.incr(f"{stage}_bytes_in", int(batch.nbytes))
            stats.incr(f"{stage}_batches", 1)
            out = fn(batch, *a, **kw)
            stats.incr(f"{stage}_bytes_out", int(out.nbytes))
            return out

        return inner

    return wrap
