"""Resumable partitioned Parquet sink.

The output contract for every long pipeline in this repo (and the
100-TB requirement): one DIRECTORY per partition key, a `_SUCCESS`
marker written only after the partition's file landed, and skip-if-
complete on re-run — so a failed 100 TB job resumes by redoing only the
missing partitions, never one giant file. The index build's segment
manifest (index/manifest.py) is the specialized form of the same idea;
this is the general-purpose sink for pipeline outputs (dedup tables,
embeddings, stats).

Shape: ``groupby(partition_col).map_groups`` — one shuffle co-locates
each partition, the writer task is idempotent (tmp file + atomic
rename + marker), and the returned manifest is one row per partition.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

SUCCESS_MARKER = "_SUCCESS"


def partition_dir(out_dir: str, value) -> str:
    return os.path.join(out_dir, f"part={value}")


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    resume: bool = True,
) -> list[dict]:
    """Write one Parquet directory per distinct ``partition_col`` value.

    Returns a manifest: [{partition, path, n_rows, skipped}] — one row
    per partition (small). With ``resume=True`` a partition whose
    ``_SUCCESS`` marker exists is not rewritten (its writer task still
    runs but does no I/O — the shuffle cost remains; callers that want
    to skip the shuffle too should filter the INPUT by the manifest)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(group: pa.Table) -> pa.Table:
        value = group[partition_col][0].as_py()
        pdir = partition_dir(out_dir, value)
        marker = os.path.join(pdir, SUCCESS_MARKER)
        skipped = resume and os.path.exists(marker)
        path = os.path.join(pdir, "data.parquet")
        if not skipped:
            os.makedirs(pdir, exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(group, tmp)
            os.replace(tmp, path)  # idempotent under task retry
            open(marker, "w").close()
        return pa.table(
            {
                "partition": pa.array([str(value)]),
                "path": pa.array([path]),
                "n_rows": pa.array([group.num_rows], pa.int64()),
                "skipped": pa.array([skipped]),
            }
        )

    return (
        ds.groupby(partition_col)
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )  # one row per partition


def read_partitioned(out_dir: str) -> "ray.data.Dataset":
    """Read back only COMPLETE partitions (those with a _SUCCESS marker)."""
    paths = []
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        if os.path.isdir(pdir) and os.path.exists(
            os.path.join(pdir, SUCCESS_MARKER)
        ):
            paths.append(os.path.join(pdir, "data.parquet"))
    return ray.data.read_parquet(paths)


def incomplete_partitions(out_dir: str, all_values) -> list:
    """Partition values still missing their _SUCCESS marker — feed this
    into an input filter to resume a failed run without re-shuffling
    finished partitions."""
    return [
        v
        for v in all_values
        if not os.path.exists(os.path.join(partition_dir(out_dir, v), SUCCESS_MARKER))
    ]
