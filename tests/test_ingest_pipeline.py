"""Declarative ingest-pipeline compiler tests."""

import pyarrow as pa
import pytest
import ray

from neural_search_ray.pipelines.ingest import (
    HashEmbeddingStage,
    compile_pipeline,
    register_processor,
)


def _docs():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], type=pa.int64()),
                "text": ["the quick brown fox jumps", "data data query"],
            }
        )
    )


def test_sparse_encoding_with_prune(ray_session):
    out = compile_pipeline(
        _docs(),
        [{"type": "sparse_encoding", "prune_type": "top_k", "prune_ratio": 1}],
    ).take_all()
    r1 = [r for r in out if r["doc_id"] == 1][0]
    assert r1["tokens"] == ["data"]
    assert r1["weights"] == [2.0]


def test_embedding_stage_deterministic(ray_session):
    out = compile_pipeline(
        _docs(), [{"type": "text_embedding", "dim": 16, "concurrency": 1}]
    ).take_all()
    assert len(out[0]["embedding"]) == 16
    # pure function of text
    direct = HashEmbeddingStage(dim=16)(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": ["the quick brown fox jumps"]})
    )
    assert direct["embedding"][0].as_py() == pytest.approx(out[0]["embedding"])


def test_chained_pipeline(ray_session):
    out = compile_pipeline(
        _docs(),
        [
            {"type": "text_chunking", "algorithm": "fixed_token_length",
             "token_limit": 2},
            {"type": "quality_stats", "id_col": "doc_id", "text_col": "chunk"},
        ],
    ).take_all()
    assert all("n_tokens" in r for r in out)
    assert len(out) > 2  # chunk explosion happened


def test_unknown_processor(ray_session):
    with pytest.raises(ValueError, match="unknown processor"):
        compile_pipeline(_docs(), [{"type": "nope"}])


def test_register_custom(ray_session):
    def upper_factory(col="text"):
        import pyarrow.compute as pc

        return lambda b: b.set_column(
            b.schema.get_field_index(col), col, pc.utf8_upper(b[col])
        )

    register_processor("upper", upper_factory)
    out = compile_pipeline(_docs(), [{"type": "upper"}]).take_all()
    assert out[0]["text"].isupper()


def test_semantic_field_composition(ray_session):
    """Semantic-field processor analogue (SURVEY §2.3): auto-chunk +
    auto-embed composed declaratively."""
    out = compile_pipeline(
        _docs(),
        [
            {"type": "text_chunking", "algorithm": "fixed_token_length",
             "token_limit": 3},
            {"type": "text_embedding", "text_column": "chunk", "dim": 8,
             "concurrency": 1},
        ],
    ).take_all()
    assert all(len(r["embedding"]) == 8 for r in out)
    assert {r["doc_id"] for r in out} == {0, 1}
    assert max(r["chunk_idx"] for r in out) >= 1  # chunking happened
