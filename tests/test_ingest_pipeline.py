"""Declarative ingest-pipeline compiler tests."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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


class TestSkipExisting:
    """skip_existing / InferenceFilter incremental reuse
    (InferenceProcessor.java:454-478, 675-761)."""

    def _docs(self, texts):
        return pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        })

    @staticmethod
    def _collect(ds):
        # uint64 text_hash overflows from_pylist int64 inference — stay Arrow
        tables = ray.get(ds.to_arrow_refs())
        return pa.concat_tables([t for t in tables if t.num_rows > 0])

    def test_first_run_then_incremental(self):
        import ray.data

        from neural_search_ray.pipelines.ingest import HashEmbeddingStage
        from neural_search_ray.stages.skip_existing import incremental_embed

        texts = [f"doc number {i} words here" for i in range(40)]
        first = self._collect(
            incremental_embed(
                ray.data.from_arrow(self._docs(texts)), None,
                HashEmbeddingStage, embed_kwargs={"dim": 8},
            )
        )
        assert first.num_rows == 40
        assert not pc.any(first["reused"]).as_py()

        # modify 3 docs, add 2 new, drop 1
        texts2 = list(texts)
        for i in (5, 17, 23):
            texts2[i] = texts2[i] + " CHANGED"
        texts2 = texts2[:-1] + [f"brand new doc {j}" for j in (100, 101)]
        new_tab = self._docs(texts2)
        second = self._collect(
            incremental_embed(
                ray.data.from_arrow(new_tab),
                ray.data.from_arrow(first.select(["doc_id", "text_hash", "embedding"])),
                HashEmbeddingStage, embed_kwargs={"dim": 8}, num_partitions=2,
            )
        )
        assert second.num_rows == 41  # 39 kept + 3 changed-in-place... (40-1)+2
        by_id = {r["doc_id"]: r for r in second.to_pylist()}
        changed = {5, 17, 23, 39, 40}  # 39/40 are the two new docs
        for i, r in by_id.items():
            assert r["reused"] == (i not in changed), i
        # reused embeddings identical to run 1; changed ones recomputed
        first_by_id = {r["doc_id"]: r for r in first.to_pylist()}
        assert by_id[6]["embedding"] == first_by_id[6]["embedding"]
        assert by_id[5]["embedding"] != first_by_id[5]["embedding"]

    def test_length_sort_micro_batcher_order_restored(self):
        from neural_search_ray.pipelines.ingest import HashEmbeddingStage

        texts = ["short", "a much longer text with many words inside", "mid size one",
                 "x", "another fairly long piece of text right here"]
        batch = pa.table({"doc_id": pa.array(list(range(5)), pa.int64()),
                          "text": pa.array(texts)})
        tiny = HashEmbeddingStage(dim=8, micro_batch_size=2)(batch)
        whole = HashEmbeddingStage(dim=8, micro_batch_size=64)(batch)
        assert tiny["embedding"].to_pylist() == whole["embedding"].to_pylist()
        assert tiny["doc_id"].to_pylist() == [0, 1, 2, 3, 4]


class TestSemanticFieldCompiler:
    """Declarative semantic-field config → pipeline/index
    (mappingtransformer/SemanticMappingTransformer.java analogue)."""

    PROPS = {
        "body": {
            "type": "semantic",
            "model_id": "hash-embed-32",
            "chunking": {"algorithm": "fixed_token_length", "token_limit": 24},
            "dense": {"dim": 16},
        },
        "title": {"type": "text"},
    }

    def test_transform_mapping_shape(self):
        from neural_search_ray.pipelines.semantic import transform_mapping

        out = transform_mapping({"properties": dict(self.PROPS)})
        info = out["properties"]["body_semantic_info"]["properties"]
        assert info["chunks"]["type"] == "nested"
        emb = info["chunks"]["properties"]["embedding"]
        assert emb == {"type": "knn_vector", "dimension": 16}
        assert "title_semantic_info" not in out["properties"]
        # sparse variant maps to rank_features
        out2 = transform_mapping(
            {"properties": {"b": {"type": "semantic", "model_id": "m", "sparse": {}}}}
        )
        assert (
            out2["properties"]["b_semantic_info"]["properties"]["chunks"][
                "properties"
            ]["embedding"]["type"]
            == "rank_features"
        )

    def test_compile_stage_list(self):
        from neural_search_ray.pipelines.semantic import compile_semantic_fields

        stages = compile_semantic_fields(self.PROPS)
        assert [s["type"] for s in stages] == ["text_chunking", "text_embedding"]
        assert stages[0]["text_column"] == "body"
        assert stages[1]["text_column"] == "chunk"
        assert stages[1]["dim"] == 16

    def test_two_chunking_fields_rejected(self):
        import pytest

        from neural_search_ray.pipelines.semantic import compile_semantic_fields

        props = {
            "a": {"type": "semantic", "model_id": "m"},
            "b": {"type": "semantic", "model_id": "m"},
        }
        with pytest.raises(ValueError, match="chunking"):
            compile_semantic_fields(props)

    def test_ingest_and_index_from_config_alone(self, ray_session, tmp_path):
        import ray as _ray

        from neural_search_ray.pipelines.semantic import (
            MAX_CHUNKS_PER_DOC,
            build_semantic_index,
            ingest_semantic,
        )
        from neural_search_ray.query.engine import IndexSearcher
        from neural_search_ray.analysis.analyzer import tokenize

        docs = pa.table(
            {
                "doc_id": pa.array(np.arange(6, dtype=np.int64)),
                "body": pa.array(
                    [
                        "alpha beta gamma " * 10,
                        "delta epsilon zeta " * 8,
                        "merge sort stream batch " * 6,
                        "quick data table row",
                        "",
                        "join hash filter " * 5,
                    ]
                ),
            }
        )
        enriched = ingest_semantic(_ray.data.from_arrow(docs), self.PROPS)
        rows = enriched.take_all()
        assert {"doc_id", "chunk_idx", "chunk", "embedding"} <= set(rows[0])
        assert all(len(r["embedding"]) == 16 for r in rows)

        m = build_semantic_index(
            _ray.data.from_arrow(docs), self.PROPS, str(tmp_path / "idx")
        )
        assert m.n_docs == len(rows)  # one index doc per chunk
        s = IndexSearcher(str(tmp_path / "idx"))
        ids, _ = s.search_bm25(tokenize("merge sort"), k=3)
        assert all(i // MAX_CHUNKS_PER_DOC == 2 for i in ids.tolist())


class TestSemanticUnchunked:
    def test_index_without_chunking(self, ray_session, tmp_path):
        import ray as _ray

        from neural_search_ray.pipelines.semantic import build_semantic_index
        from neural_search_ray.query.engine import IndexSearcher
        from neural_search_ray.analysis.analyzer import tokenize

        docs = pa.table(
            {
                "doc_id": pa.array(np.arange(4, dtype=np.int64)),
                "body": pa.array(["alpha beta", "merge sort", "quick data", ""]),
            }
        )
        props = {"body": {"type": "semantic", "model_id": "m", "chunking": False,
                          "dense": {"dim": 8}}}
        m = build_semantic_index(
            _ray.data.from_arrow(docs), props, str(tmp_path / "idx")
        )
        assert m.n_docs == 4  # one index doc per source doc
        s = IndexSearcher(str(tmp_path / "idx"))
        ids, _ = s.search_bm25(tokenize("merge"), k=2)
        from neural_search_ray.pipelines.semantic import MAX_CHUNKS_PER_DOC

        assert [i // MAX_CHUNKS_PER_DOC for i in ids.tolist()] == [1]

    def test_two_unchunked_fields_rejected(self, ray_session, tmp_path):
        import pytest as _pytest
        import ray as _ray

        from neural_search_ray.pipelines.semantic import build_semantic_index

        docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                         "a": pa.array(["x"]), "b": pa.array(["y"])})
        props = {
            "a": {"type": "semantic", "model_id": "m", "chunking": False},
            "b": {"type": "semantic", "model_id": "m", "chunking": False},
        }
        with _pytest.raises(ValueError, match="exactly one"):
            build_semantic_index(_ray.data.from_arrow(docs), props, str(tmp_path / "i"))
