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
