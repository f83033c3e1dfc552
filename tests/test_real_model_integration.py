"""Opt-in REAL-model integration: proves the InferenceStage adapter seam
(pipelines/ingest.py, the ml/MLCommonsClientAccessor.java:109-515 /
processor/InferenceProcessor.java:63-858 analogue) accepts an actual
tokenizer/encoder with NO re-plumbing — subclass, point at a checkpoint,
run embed → ANN-index → query.

Skipped in this container (no model weights, no GPU, no network): enable on
a real host with

    NSR_REAL_MODEL=sentence-transformers/all-MiniLM-L6-v2 \
        python -m pytest tests/test_real_model_integration.py -q

The seam signature frozen by this test:
  load_model(self) -> None                    # once per actor
  infer_batch(self, texts: list[str]) -> np.ndarray   # (n, dim) float64
Everything else (length-sort micro-batching, actor-pool sizing, Arrow
plumbing, downstream kNN) is shared with the hash-embed stub, so a green
run here is a green run for any model that fits the two methods.
"""

import os

import numpy as np
import pytest

MODEL_ID = os.environ.get("NSR_REAL_MODEL", "")

try:  # the real-model dependency is intentionally NOT in this container
    import sentence_transformers  # noqa: F401

    _HAVE_ST = True
except ImportError:
    _HAVE_ST = False

pytestmark = pytest.mark.skipif(
    not (MODEL_ID and _HAVE_ST),
    reason=(
        "real-model integration is opt-in: set NSR_REAL_MODEL=<hf-model-id> "
        "on a host with sentence-transformers installed (this container has "
        "no model weights or network)"
    ),
)


def test_real_encoder_through_inference_seam(ray_session, tmp_path):
    import pyarrow as pa
    import ray

    from neural_search_ray.ann.brute import knn_brute_force
    from neural_search_ray.pipelines.ingest import InferenceStage

    class RealEmbeddingStage(InferenceStage):
        """The entire integration surface: two methods."""

        def load_model(self) -> None:
            from sentence_transformers import SentenceTransformer

            self._model = SentenceTransformer(MODEL_ID)
            self.dim = self._model.get_sentence_embedding_dimension()

        def infer_batch(self, texts):
            return np.asarray(
                self._model.encode(texts, convert_to_numpy=True), dtype=np.float64
            )

    docs = [f"document number {i} about topic {i % 7}" for i in range(100)]
    t = pa.table(
        {"doc_id": pa.array(np.arange(100, dtype=np.int64)), "text": pa.array(docs)}
    )
    probe = RealEmbeddingStage()  # resolve dim once, driver-side
    embedded = ray.data.from_arrow(t).map_batches(
        RealEmbeddingStage,
        fn_constructor_kwargs={"dim": probe.dim},
        concurrency=2,
        batch_size=32,
        batch_format="pyarrow",
    )
    rows = embedded.take_all()
    assert len(rows) == 100
    assert all(len(r["embedding"]) == probe.dim for r in rows)

    # the embeddings flow into the existing ANN surface unchanged
    emb_ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r["embedding"] for r in rows], pa.list_(pa.float64())
                ),
            }
        )
    )
    q = np.asarray([rows[3]["embedding"]], dtype=np.float64)
    out = knn_brute_force(emb_ds, q, np.array([0]), k=5)
    # self-similarity must rank first for a real encoder
    assert out["neighbor_id"][0].as_py() == 3
