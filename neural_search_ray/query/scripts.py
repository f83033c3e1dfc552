"""Registered score scripts for the script_score query.

Reference restatement: OpenSearch's ``script_score`` query
(ScriptScoreQueryBuilder / ScriptScoreQuery) wraps an inner query and
replaces every hit's score with a user script evaluated over the doc's
fields and the inner ``_score``. The reference inherits that surface
from core; neural-search's hybrid/rerank processors compose with it.

Ray-native restatement: a script is a registered vectorized kernel —
``score(cols, bm25)`` gets the matched docs' doc-values columns as
numpy arrays plus the inner query's exact BM25 scores, and returns the
replacement scores in one numpy expression. Same registry discipline
as ``agg/scripted.py`` (no eval of user strings; scripts are code
registered under a name, the Painless-compilation analogue). The
registry is the user-extension point: ``SCORE_SCRIPTS["mine"] = ...``.

Scripts must keep float-operation ORDER reproducible (one expression
over float64 arrays) so a SQL oracle evaluating the same expression
matches float-for-float.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np


@dataclass(frozen=True)
class ScoreScript:
    """A named score script: ``columns`` are the doc-values columns the
    kernel needs; ``score`` maps (cols, inner _score) -> new scores."""

    name: str
    columns: tuple[str, ...]
    score: Callable[[dict[str, np.ndarray], np.ndarray], np.ndarray]


def _length_norm(field: str, weight: float = 1.0) -> ScoreScript:
    """``weight * _score / sqrt(1 + field)`` — an inverse-length
    normalization. Deliberately NOT expressible through
    function_score's field_value_factor modifiers (ln1p/ln/sqrt/none
    all multiply; there is no reciprocal modifier), so it demonstrates
    the script surface adding real capability."""

    def kernel(cols: dict[str, np.ndarray], bm25: np.ndarray) -> np.ndarray:
        v = cols[field].astype(np.float64)
        return weight * bm25 / np.sqrt(1.0 + v)

    return ScoreScript(
        name=f"length_norm({field})", columns=(field,), score=kernel
    )


def _field_blend(field: str, alpha: float) -> ScoreScript:
    """``alpha * _score + (1 - alpha) * ln(1 + field)`` — an additive
    blend of relevance and a static signal (rank_feature is
    multiplicative-only in this engine, so the additive form is script
    territory). One fused expression; addition order pinned
    (score-term first) so SQL replays it exactly."""

    def kernel(cols: dict[str, np.ndarray], bm25: np.ndarray) -> np.ndarray:
        v = cols[field].astype(np.float64)
        return alpha * bm25 + (1.0 - alpha) * np.log(1.0 + v)

    return ScoreScript(
        name=f"field_blend({field},{alpha})", columns=(field,), score=kernel
    )


SCORE_SCRIPTS: dict[str, Callable[..., ScoreScript]] = {
    "length_norm": _length_norm,
    "field_blend": _field_blend,
}
