"""Deterministic Bloom membership (dedup/bloom.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from neural_search_ray.dedup.bloom import (
    bloom_flag_stage,
    bloom_positions,
    build_bloom,
)


def _ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


class TestBloom:
    def test_exact_members_always_hit(self, ray_session):
        import ray

        m = 1 << 12
        corpus = [f"doc number {i} words" for i in range(50)]
        bitmap = build_bloom(_ds(corpus), m)
        ref = ray.put(bitmap)
        out = (
            _ds(corpus)
            .map_batches(bloom_flag_stage(ref, m), batch_format="pyarrow")
            .take_all()
        )
        assert all(r["seen_before"] == 1 for r in out)  # no false negatives

    def test_nonmembers_mostly_miss_and_deterministic(self, ray_session):
        import ray

        m = 1 << 16  # large: FP rate ~ (150/65536)^3 ~ 0
        corpus = [f"doc number {i} words" for i in range(50)]
        probe = [f"other text {i}" for i in range(50)]
        bitmap = build_bloom(_ds(corpus), m)
        ref = ray.put(bitmap)
        out = (
            _ds(probe)
            .map_batches(bloom_flag_stage(ref, m), batch_format="pyarrow")
            .take_all()
        )
        flags = sorted((r["doc_id"], r["seen_before"]) for r in out)
        assert all(f == 0 for _, f in flags)
        # deterministic: same build twice -> identical bitmap
        assert np.array_equal(bitmap, build_bloom(_ds(corpus), m))

    def test_positions_shape_and_range(self):
        pos = bloom_positions(["a", "b", "c"], 1 << 10)
        assert pos.shape == (3, 3)
        assert pos.min() >= 0 and pos.max() < (1 << 10)
        # distinct texts hash to distinct position triples (w.h.p.)
        assert len({tuple(p) for p in pos}) == 3
