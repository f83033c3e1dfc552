"""Resumable partitioned Parquet sink tests."""

import os

import numpy as np
import pyarrow as pa
import ray


class TestPartitionedSink:
    def _ds(self, n=200):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "bucket": pa.array((np.arange(n) % 5).astype(np.int64)),
            "payload": pa.array([f"row {i}" for i in range(n)]),
        }))

    def test_write_read_roundtrip(self, tmp_path):
        from neural_search_ray.sources.sink import read_partitioned, write_partitioned

        manifest = write_partitioned(self._ds(), str(tmp_path), "bucket")
        assert len(manifest) == 5
        assert all(not r["skipped"] for r in manifest)
        back = read_partitioned(str(tmp_path)).take_all()
        assert len(back) == 200
        assert {r["doc_id"] for r in back} == set(range(200))

    def test_resume_skips_complete_partitions(self, tmp_path):
        from neural_search_ray.sources.sink import (
            SUCCESS_MARKER,
            incomplete_partitions,
            partition_dir,
            write_partitioned,
        )

        write_partitioned(self._ds(), str(tmp_path), "bucket")
        # simulate a failed partition: drop its marker
        os.remove(os.path.join(partition_dir(str(tmp_path), 3), SUCCESS_MARKER))
        assert incomplete_partitions(str(tmp_path), range(5)) == [3]
        manifest = write_partitioned(self._ds(), str(tmp_path), "bucket")
        skipped = {r["partition"]: r["skipped"] for r in manifest}
        assert skipped == {"0": True, "1": True, "2": True, "3": False, "4": True}
        assert incomplete_partitions(str(tmp_path), range(5)) == []
