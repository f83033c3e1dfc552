"""Declarative semantic-field compiler: field-config dict → ingest pipeline.

The Ray analogue of the reference's semantic mapping transformer
(mappingtransformer/SemanticMappingTransformer.java:63-110,
SemanticInfoConfigBuilder.java:200-240): a field typed ``semantic`` with a
``model_id`` is auto-expanded — mapping side into a ``<field>_semantic_info``
structure, pipeline side into chunk → embed stages — so users declare WHAT a
field is, not how to process it.

Two surfaces:

- ``transform_mapping(mapping)``: pure dict→dict transform mirroring the
  reference's output shape (semantic_info sibling with chunks/embedding/model
  properties). No I/O.
- ``compile_semantic_fields(properties)`` / ``ingest_semantic(ds, properties)``:
  compile the same field configs into a pipelines.ingest stage list and run it
  (chunking → dense hash-embed stub or sparse encoding). ``build_semantic_index``
  goes one step further and builds the BM25/sparse index over the chunk rows —
  an index from a field-config dict alone.

Field config keys (per semantic field):
  model_id:   str (recorded in the semantic_info model block)
  chunking:   True | False | {algorithm, **params} (default True,
              fixed_token_length — SemanticInfoConfigBuilder's default)
  dense:      {dim: int} — dense embedding (default when no sparse config)
  sparse:     {prune_type?, prune_ratio?} — sparse encoding instead of dense

Tabular constraint (documented): chunking EXPLODES rows, so at most one
semantic field per pipeline may chunk — the reference stores chunks in a
nested per-field subdocument, which a flat Arrow table cannot express twice.
"""

from __future__ import annotations

from typing import Any

import ray.data

SEMANTIC_TYPE = "semantic"
DEFAULT_CHUNKING = {"algorithm": "fixed_token_length"}
DEFAULT_DENSE_DIM = 32


def transform_mapping(mapping: dict) -> dict:
    """Add ``<field>_semantic_info`` properties for each semantic field —
    the reference's mapping rewrite (SemanticMappingTransformer.java:63-110)
    re-expressed over plain dicts. Returns a NEW mapping; input unchanged."""
    out = {k: v for k, v in mapping.items()}
    props = dict(out.get("properties", {}))
    for field, cfg in list(props.items()):
        if not isinstance(cfg, dict) or cfg.get("type") != SEMANTIC_TYPE:
            continue
        if "model_id" not in cfg:
            raise ValueError(f"semantic field {field!r} requires model_id")
        sparse = "sparse" in cfg
        embedding_prop: dict[str, Any] = (
            {"type": "rank_features"}
            if sparse
            else {
                "type": "knn_vector",
                "dimension": int(cfg.get("dense", {}).get("dim", DEFAULT_DENSE_DIM)),
            }
        )
        props[f"{field}_semantic_info"] = {
            "properties": {
                "chunks": {
                    "type": "nested",
                    "properties": {
                        "embedding": embedding_prop,
                        "text": {"type": "text"},
                    },
                },
                "model": {
                    "properties": {
                        "id": {"type": "text", "index": False},
                        "type": {"type": "text", "index": False},
                    }
                },
            }
        }
    out["properties"] = props
    return out


def compile_semantic_fields(
    properties: dict, id_column: str = "doc_id"
) -> list[dict]:
    """Field-config dict → pipelines.ingest.compile_pipeline stage list."""
    stages: list[dict] = []
    chunked_already = False
    for field, cfg in properties.items():
        if not isinstance(cfg, dict) or cfg.get("type") != SEMANTIC_TYPE:
            continue
        if "model_id" not in cfg:
            raise ValueError(f"semantic field {field!r} requires model_id")
        chunking = cfg.get("chunking", True)
        text_col = field
        if chunking:
            if chunked_already:
                raise ValueError(
                    "at most one semantic field may enable chunking in a "
                    "flat-table pipeline (chunking explodes rows); set "
                    "chunking=False on the others"
                )
            chunked_already = True
            ch = dict(DEFAULT_CHUNKING) if chunking is True else dict(chunking)
            algorithm = ch.pop("algorithm", DEFAULT_CHUNKING["algorithm"])
            stages.append(
                {
                    "type": "text_chunking",
                    "algorithm": algorithm,
                    "text_column": field,
                    "id_column": id_column,
                    **ch,
                }
            )
            text_col = "chunk"
        if "sparse" in cfg:
            stages.append(
                {"type": "sparse_encoding", "text_column": text_col,
                 "id_column": id_column, **cfg["sparse"]}
            )
        else:
            dense = cfg.get("dense", {})
            stages.append(
                {
                    "type": "text_embedding",
                    "text_column": text_col,
                    "dim": int(dense.get("dim", DEFAULT_DENSE_DIM)),
                }
            )
    if not stages:
        raise ValueError("no semantic fields in properties")
    return stages


def ingest_semantic(
    ds: "ray.data.Dataset", properties: dict, id_column: str = "doc_id"
) -> "ray.data.Dataset":
    """Run the compiled semantic pipeline over a Dataset."""
    from .ingest import compile_pipeline

    return compile_pipeline(ds, compile_semantic_fields(properties, id_column))


MAX_CHUNKS_PER_DOC = 1 << 20  # chunk-id packing bound (documented assumption)


def build_semantic_index(
    ds: "ray.data.Dataset",
    properties: dict,
    index_dir: str,
    id_column: str = "doc_id",
    index_config=None,
):
    """Field-config dict → chunk/embed pipeline → BM25 index over the chunk
    rows, in one call. Chunk rows get globally-unique int ids
    ``doc_id * MAX_CHUNKS_PER_DOC + chunk_idx`` (assumes < 2^20 chunks per
    doc). Returns the index manifest."""
    import pyarrow as pa

    from ..config import IndexConfig
    from ..index.build import build_index

    semantic_fields = [
        f for f, c in properties.items()
        if isinstance(c, dict) and c.get("type") == SEMANTIC_TYPE
    ]
    chunked = any(
        properties[f].get("chunking", True) for f in semantic_fields
    )
    if not chunked and len(semantic_fields) != 1:
        raise ValueError(
            "build_semantic_index without chunking needs exactly one "
            "semantic field to index (got "
            f"{semantic_fields!r}); enable chunking or split the config"
        )
    text_field = semantic_fields[0]
    enriched = ingest_semantic(ds, properties, id_column)

    def to_chunk_docs(batch: pa.Table) -> pa.Table:
        import numpy as np

        doc = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        if chunked:
            idx = batch["chunk_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            text = batch["chunk"]
        else:  # unchunked: the whole field is one chunk (chunk_idx 0)
            idx = np.zeros(len(doc), dtype=np.int64)
            text = batch[text_field]
        return pa.table(
            {
                "doc_id": pa.array(doc * MAX_CHUNKS_PER_DOC + idx),
                "text": text,
            }
        )

    chunk_docs = enriched.map_batches(to_chunk_docs, batch_format="pyarrow")
    return build_index(chunk_docs, index_dir, index_config or IndexConfig())
