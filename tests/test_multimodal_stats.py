"""Multimodal plumbing (stubbed decode kernel) + stats registry."""

import numpy as np
import pyarrow as pa
import pytest

from neural_search_ray.multimodal.media import (
    MEDIA_SCHEMA,
    FakeImageDecoder,
    MediaDecodeStage,
    frame_sample_stage,
)
from neural_search_ray.state.stats import StatsRegistry


def _media_batch():
    return pa.table(
        {
            "media_id": pa.array([1, 2, 3], type=pa.int64()),
            "kind": pa.array(["image", "image", "video"]),
            "mime": pa.array(["image/png", "image/jpeg", "video/mp4"]),
            "width": pa.array([8, 8, -1], type=pa.int32()),
            "height": pa.array([8, 8, -1], type=pa.int32()),
            "duration_ms": pa.array([0, 0, 3500], type=pa.int32()),
            "payload": pa.array([b"aa", b"bb", b"cc"], type=pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def test_decode_stage_default_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaDecodeStage()(_media_batch())


def test_decode_stage_with_fake_decoder():
    out = MediaDecodeStage(decoder=FakeImageDecoder())(_media_batch())
    assert out.column_names == ["media_id", "kind", "feat"]
    assert "payload" not in out.column_names  # wide column projected away
    feats = out["feat"].to_pylist()
    assert len(feats) == 3 and len(feats[0]) == 3
    # deterministic
    out2 = MediaDecodeStage(decoder=FakeImageDecoder())(_media_batch())
    assert out.equals(out2)


def test_decode_stage_in_ray_pipeline(ray_session):
    import ray

    ds = ray.data.from_arrow(_media_batch())
    rows = ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs=dict(decoder=FakeImageDecoder()),
        concurrency=1,
        batch_size=2,
        batch_format="pyarrow",
    ).take_all()
    assert len(rows) == 3


def test_frame_sampling():
    out = frame_sample_stage(_media_batch(), every_ms=1000)
    assert out["media_id"].to_pylist() == [3, 3, 3, 3]
    assert out["frame_ts_ms"].to_pylist() == [0, 1000, 2000, 3000]


def test_stats_registry():
    r = StatsRegistry()
    r.incr("x")
    r.incr("x", 2)
    r.merge({"x": 1, "y": 5})
    assert r.snapshot() == {"x": 4, "y": 5}
    r.reset()
    assert r.snapshot() == {}


def test_searcher_counters(tmp_path, ray_session, sf_dir):
    import ray

    from neural_search_ray.config import IndexConfig
    from neural_search_ray.index.build import build_index
    from neural_search_ray.query.engine import IndexSearcher
    from neural_search_ray.state.stats import stats

    idx = str(tmp_path / "statidx")
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    build_index(ds, idx, IndexConfig(num_shards=2, num_salts=1))
    stats.reset()
    s = IndexSearcher(idx)
    s.search_bm25(["data", "join"], k=5)
    snap = stats.snapshot()
    assert snap.get("bm25_queries") == 1
    assert snap.get("postings_decoded", 0) >= 1
