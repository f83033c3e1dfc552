"""Per-worker runtime tuning.

Every Ray worker process runs our map functions single-task-at-a-time;
pyarrow's internal compute thread pool defaults to the machine's core
count, so 32 workers × 32 Arrow threads oversubscribe the node ~32× and
stages show huge straggler variance (measured: task wall 8s max vs 2s
mean on a uniform workload). Pin Arrow to 1 compute thread per worker —
parallelism comes from Ray tasks, not intra-kernel threads.
"""

from __future__ import annotations

_done = False


def ensure_worker_tuned() -> None:
    global _done
    if _done:
        return
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)
    _done = True


def join_partitions(requested: int) -> int:
    """Partition count for Dataset.join: hash-join aggregators are
    actors holding a CPU each, so more partitions than cluster CPUs
    deadlocks a small cluster; on a big cluster the requested count
    wins."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(requested, cpus))
