"""Score combination techniques (weighted means + RRF sum), vectorized.

Re-specified from the reference combination package (semantics matched
exactly, code not copied):

- arithmetic_mean (combination/ArithmeticMeanScoreCombinationTechnique.java:43-55):
  Σ w_i·s_i / Σ w_i over subqueries with s_i >= 0 (a doc absent from a
  subquery contributes nothing — treated as absent, not 0); 0 if no
  weights accumulated.
- geometric_mean (GeometricMeanScoreCombinationTechnique.java:44-60):
  exp(Σ w_i·ln s_i / Σ w_i) over s_i > 0; 0 if none.
- harmonic_mean (HarmonicMeanScoreCombinationTechnique.java:42-55):
  Σ w_i / Σ (w_i/s_i) over s_i > 0; 0 if none.
- rrf (RRFScoreCombinationTechnique.java:40-55): weighted SUM of
  per-subquery rrf contributions.

``scores`` is an (n_docs, n_subqueries) float64 matrix with NaN marking
"doc not returned by this subquery" (the reference's absent ScoreDoc).
"""

from __future__ import annotations

import numpy as np


def _weights(n: int, weights) -> np.ndarray:
    if weights is None:
        return np.full(n, 1.0)
    w = np.asarray(weights, dtype=np.float64)
    if w.size != n:
        raise ValueError(f"number of weights {w.size} must match subqueries {n}")
    return w


def combine_arithmetic_mean(scores: np.ndarray, weights=None) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    w = _weights(s.shape[1], weights)
    mask = ~np.isnan(s) & (s >= 0.0)
    sw = (np.where(mask, s, 0.0) * w).sum(axis=1)
    denom = (mask * w).sum(axis=1)
    return np.where(denom > 0, sw / np.where(denom == 0, 1, denom), 0.0)


def combine_geometric_mean(scores: np.ndarray, weights=None) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    w = _weights(s.shape[1], weights)
    mask = ~np.isnan(s) & (s > 0.0)
    ln = np.where(mask, np.log(np.where(mask, s, 1.0)), 0.0)
    num = (ln * w * mask).sum(axis=1)
    denom = (mask * w).sum(axis=1)
    return np.where(denom > 0, np.exp(num / np.where(denom == 0, 1, denom)), 0.0)


def combine_harmonic_mean(scores: np.ndarray, weights=None) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    w = _weights(s.shape[1], weights)
    mask = ~np.isnan(s) & (s > 0.0)
    harm = (np.where(mask, w / np.where(mask, s, 1.0), 0.0)).sum(axis=1)
    sw = (mask * w).sum(axis=1)
    return np.where(harm > 0, sw / np.where(harm == 0, 1, harm), 0.0)


def combine_rrf(scores: np.ndarray, weights=None) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    w = _weights(s.shape[1], weights)
    mask = ~np.isnan(s)
    return (np.where(mask, s, 0.0) * w).sum(axis=1)


COMBINATION_TECHNIQUES = {
    "arithmetic_mean": combine_arithmetic_mean,
    "geometric_mean": combine_geometric_mean,
    "harmonic_mean": combine_harmonic_mean,
    "rrf": combine_rrf,
}


def combine_scores(technique: str, scores: np.ndarray, weights=None) -> np.ndarray:
    return COMBINATION_TECHNIQUES[technique](scores, weights)
