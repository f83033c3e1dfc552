"""neural_query_enricher: fill default model ids into neural query specs.

Reference semantics (matched exactly, code not copied):
  processor/NeuralQueryEnricherProcessor.java:69-78 — a search-request
  processor walks the query-builder tree and applies a visitor to every
  clause; processor/Factory.java:100-105 requires at least one of
  default_model_id / neural_field_default_id at construction.
  query/visitor/NeuralSearchQueryVisitor.java:38-54 — for each
  model-inference clause whose model_id is unset: per-field default wins
  over the processor-wide default; if neither exists the request fails.

Ray-side shape: queries here are plain dict specs (the same coordinator-
side plan dicts `query/agentic.py` validates), so the "visitor" is a
recursive walk over nested bool clauses. Enrichment is coordinator-side
rewriting — it happens once per request on the driver, never inside a
`map_batches` stage, exactly like the reference's request processor runs
on the coordinator node before shard fan-out.
"""

from __future__ import annotations

import copy
from collections.abc import Mapping

# clause types that carry a model inference (the reference's
# ModelInferenceQueryBuilder implementors: NeuralQueryBuilder,
# NeuralSparseQueryBuilder, NeuralKNNQueryBuilder).
MODEL_INFERENCE_TYPES = frozenset({"neural", "neural_sparse", "neural_knn"})

# keys whose values are sub-clauses (OpenSearch bool occurs + wrappers)
_CHILD_LIST_KEYS = ("must", "must_not", "should", "filter", "queries")
_CHILD_KEYS = ("query", "positive", "negative")


class EnrichError(ValueError):
    """model id missing and no default available (visitor line 47-50)."""


def make_enricher(
    default_model_id: str | None = None,
    neural_field_default_id: Mapping[str, str] | None = None,
):
    """Factory: returns ``enrich(query_spec) -> new spec``.

    Raises ValueError when neither default is provided, matching
    NeuralQueryEnricherProcessor.Factory (java:100-105).
    """
    if default_model_id is None and neural_field_default_id is None:
        raise ValueError(
            "model Id or neural info map either of them should be provided"
        )
    field_map = dict(neural_field_default_id or {})

    def visit(node) -> None:
        if isinstance(node, dict):
            if node.get("type") in MODEL_INFERENCE_TYPES and node.get("model_id") is None:
                fname = node.get("field")
                if fname is not None and fname in field_map:
                    node["model_id"] = field_map[fname]
                elif default_model_id is not None:
                    node["model_id"] = default_model_id
                else:
                    raise EnrichError(
                        "model id must be provided in neural query or a "
                        "default model id must be set in search request "
                        "processor"
                    )
            for k in _CHILD_LIST_KEYS:
                for child in node.get(k) or ():
                    visit(child)
            for k in _CHILD_KEYS:
                child = node.get(k)
                if child is not None:
                    visit(child)

    def enrich(query_spec: dict | None) -> dict | None:
        # null query (empty search body) passes through untouched
        # (NeuralQueryEnricherProcessor.java:73 null check)
        if query_spec is None:
            return None
        out = copy.deepcopy(query_spec)
        visit(out)
        return out

    return enrich
