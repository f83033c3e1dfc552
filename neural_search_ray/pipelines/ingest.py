"""Declarative ingest pipelines: the Ray analogue of OpenSearch ingest
pipelines (SURVEY.md §2.12).

The reference registers named processors via IngestPlugin.getProcessors
(plugin/NeuralSearch.java:311-342) and users compose them in pipeline
JSON; here a pipeline is a list of stage configs compiled onto a
``ray.data.Dataset`` as chained ``map_batches`` (stateless) /
callable-class (stateful) stages. Registries are plain dicts —
user-extensible with ``register_processor``.

Built-in processors:

- ``text_chunking``        {algorithm, text_column, id_column, **params}
    → explodes to (id, chunk_idx, chunk)          [TextChunkingProcessor]
- ``sparse_encoding``      {text_column, prune_type?, prune_ratio?}
    → adds tokens:list<str> + weights:list<float> (analyzer tf encoding
      + optional prune)                        [SparseEncodingProcessor]
- ``text_embedding``       {text_column, dim}
    → adds embedding:list<float> via the deterministic hash-embedding
      stub (no model weights in this environment; the real deployment
      passes a model-backed stage)              [TextEmbeddingProcessor]
- ``quality_stats``        {} → per-doc quality columns
- ``langid``               {} → pred_lang column
- ``extract_text``         {} → html→text, invariant-checked
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray.data


def _sparse_encoding_stage(text_column: str = "text", id_column: str = "doc_id",
                           prune_type: str | None = None, prune_ratio: float = 0.0):
    """Vectorized sparse encoding: the tfvec kernel (Arrow C++ analyzer
    fast path → dictionary_encode → paired np.unique) plus the segmented
    prune mask — no per-row tokenize loop (scalar semantics preserved:
    per-doc token lists are term-lexicographic)."""
    import pyarrow.compute as pc

    from ..config import AnalyzerConfig
    from ..stages.tfvec import _segment_prune_mask, doc_term_tf

    cfg = AnalyzerConfig()

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_idx, codes, tf, uniques = doc_term_tf(batch, cfg, id_column, text_column)
        w = tf.astype(np.float64)
        if codes.size:
            sort_idx = pc.sort_indices(uniques).to_numpy(zero_copy_only=False)
            rank_by_code = np.empty(len(uniques), dtype=np.int64)
            rank_by_code[sort_idx] = np.arange(len(uniques))
            if prune_type:
                order, keep = _segment_prune_mask(
                    doc_idx, rank_by_code, codes, w, prune_type, prune_ratio
                )
                sel = order[keep]
                doc_idx, codes, w = doc_idx[sel], codes[sel], w[sel]
            o2 = np.lexsort((rank_by_code[codes], doc_idx))
            doc_idx, codes, w = doc_idx[o2], codes[o2], w[o2]
        counts = np.bincount(doc_idx, minlength=n) if n else np.zeros(0, np.int64)
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        tok_flat = (
            uniques.take(pa.array(codes)) if codes.size
            else pa.array([], type=pa.string())
        )
        return batch.append_column(
            "tokens",
            pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()), tok_flat),
        ).append_column(
            "weights",
            pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()), pa.array(w, type=pa.float64())
            ),
        )

    return fn


class InferenceStage:
    """Model-inference actor stage: the adapter seam for a real model.

    Subclasses implement ``load_model()`` (once per actor — weights,
    tokenizer, device) and ``infer_batch(texts) -> (n, dim) ndarray``.
    ``__call__`` applies the reference's LENGTH-SORT MICRO-BATCHER
    (InferenceProcessor.java:221-270): rows are sorted by text length,
    cut into ``micro_batch_size`` model calls (so padding within a model
    batch is minimal), and results are restored to input order. A GPU
    deployment swaps in a subclass whose infer_batch calls the model —
    no pipeline re-plumbing (the ML-Commons client seam,
    ml/MLCommonsClientAccessor.java:109-515)."""

    output_column = "embedding"

    def __init__(self, text_column: str = "text", dim: int = 32,
                 micro_batch_size: int = 64):
        self.text_column = text_column
        self.dim = dim
        self.micro_batch_size = micro_batch_size
        self.load_model()

    def load_model(self) -> None:  # once per actor
        pass

    def infer_batch(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_column].to_pylist()]
        order = np.argsort([len(t) for t in texts], kind="stable")
        out = np.empty((len(texts), self.dim), dtype=np.float64)
        for s in range(0, len(order), self.micro_batch_size):
            idx = order[s : s + self.micro_batch_size]
            out[idx] = self.infer_batch([texts[i] for i in idx])
        return batch.append_column(
            self.output_column,
            pa.array(list(out), type=pa.list_(pa.float64())),
        )


class HashEmbeddingStage(InferenceStage):
    """Deterministic dense-embedding stub (callable class → actor pool):
    embedding[j] = sum over tokens of ±1/sqrt(dim) by bit j of h64(token).
    Stands in for the ML-Commons model call; a real deployment subclasses
    InferenceStage with actual weights — the micro-batcher and actor
    plumbing stay identical."""

    def load_model(self) -> None:
        from ..analysis.analyzer import tokenize
        from ..dedup.common import h64

        self._tokenize = tokenize
        self._h64 = h64

    def infer_batch(self, texts: list[str]) -> np.ndarray:
        dim = self.dim
        scale = 1.0 / np.sqrt(dim)
        out = np.empty((len(texts), dim), dtype=np.float64)
        for row, text in enumerate(texts):
            acc = np.zeros(dim)
            for t in self._tokenize(text):
                h = self._h64(t)
                bits = (h >> np.arange(dim, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, scale, -scale)
            out[row] = acc
        return out


def _chunking_stage(**params):
    from ..stages.chunkers import make_chunk_stage

    algorithm = params.pop("algorithm")
    return make_chunk_stage(algorithm, **params)


def _quality_stage(**params):
    from ..textstats.quality import quality_stats_stage

    return lambda b: quality_stats_stage(b, **params)


def _langid_stage(**params):
    from ..textstats.langid import langid_stage

    return lambda b: langid_stage(b, **params)


def _extract_stage(**params):
    from ..corpus.extract import extract_text_stage

    return extract_text_stage


# name → factory returning either a map fn or (cls, ctor_kwargs)
PROCESSORS: dict[str, Callable] = {
    "text_chunking": _chunking_stage,
    "sparse_encoding": _sparse_encoding_stage,
    "quality_stats": _quality_stage,
    "langid": _langid_stage,
    "extract_text": _extract_stage,
}

STATEFUL_PROCESSORS: dict[str, type] = {
    "text_embedding": HashEmbeddingStage,
}


def register_processor(name: str, factory: Callable, stateful: bool = False) -> None:
    (STATEFUL_PROCESSORS if stateful else PROCESSORS)[name] = factory


def compile_pipeline(ds: "ray.data.Dataset", stages: list[dict]) -> "ray.data.Dataset":
    """Compile a declarative stage list onto a Dataset.

    Each stage config: {"type": <name>, ...params, "concurrency": N?,
    "batch_size": B?} — concurrency/batch_size are Ray execution knobs
    (actor-pool sizing for stateful stages, SURVEY.md §4).
    """
    for cfg in stages:
        cfg = dict(cfg)
        kind = cfg.pop("type")
        concurrency = cfg.pop("concurrency", None)
        batch_size = cfg.pop("batch_size", "default")
        kwargs: dict = {"batch_format": "pyarrow"}
        if batch_size != "default":
            kwargs["batch_size"] = batch_size
        if kind in STATEFUL_PROCESSORS:
            kwargs["fn_constructor_kwargs"] = cfg
            kwargs["concurrency"] = concurrency or 1
            ds = ds.map_batches(STATEFUL_PROCESSORS[kind], **kwargs)
        elif kind in PROCESSORS:
            if concurrency:
                kwargs["concurrency"] = concurrency
            ds = ds.map_batches(PROCESSORS[kind](**cfg), **kwargs)
        else:
            raise ValueError(
                f"unknown processor {kind!r}; registered: "
                f"{sorted(PROCESSORS) + sorted(STATEFUL_PROCESSORS)}"
            )
    return ds
