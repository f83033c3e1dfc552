"""Score normalization techniques for hybrid search (vectorized numpy).

Re-specified from the reference (semantics matched exactly, code not
copied). Normalization statistics are computed per subquery over ALL
results of a query (across shards — the coordinator-reduce step,
processor/NormalizationProcessorWorkflow.java:66-124).

- min_max (processor/normalization/MinMaxScoreNormalizationTechnique.java:47-297):
  n = (s - min)/(max - min); if max==min==s → 1.0; if the computed n is
  exactly 0.0 → 0.001 (MIN_SCORE).
- l2 (L2ScoreNormalizationTechnique.java:47-72): n = s/sqrt(Σ s²);
  norm==0 → 0.001.
- z_score (ZScoreNormalizationTechnique.java:40-72,214-227):
  if s == mean → max raw score of the subquery; elif std == 0 → min raw
  score; else n = (s-mean)/std, and n <= 0 → 0.001. std is the SAMPLE
  std (n-1 denominator — Commons-Math DescriptiveStatistics
  .getStandardDeviation() is bias-corrected); n==1 → std 0.
- rrf (RRFNormalizationTechnique.java:46-76,222): n = 1/(rank_constant +
  rank), rank 1-based by (score desc, doc_id asc), rounded half-up to 10
  decimal places (the reference's BigDecimal scale-10 division);
  rank_constant default 60.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import numpy as np

MIN_SCORE = 0.001
SINGLE_RESULT_SCORE = 1.0
DEFAULT_RANK_CONSTANT = 60


def norm_min_max(scores: np.ndarray) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    mn, mx = s.min(), s.max()
    if mx == mn:
        return np.full(s.shape, SINGLE_RESULT_SCORE)
    out = (s - mn) / (mx - mn)
    out[out == 0.0] = MIN_SCORE
    return out


def norm_min_max_bounded(
    scores: np.ndarray,
    lower_bound: dict | None = None,
    upper_bound: dict | None = None,
) -> np.ndarray:
    """min_max with per-subquery lower/upper bounds
    (MinMaxScoreNormalizationTechnique.java:260-297 +
    normalization/bounds/{LowerBound,UpperBound,BoundMode}.java —
    semantics matched, code not copied).

    Bound params: {"mode": "apply"|"clip"|"ignore", "min_score": f} /
    {"mode": ..., "max_score": f}; mode defaults to "apply", scores to
    0.0 / 1.0. Per element:
    - single-score edge (max==min==s) → 1.0;
    - effective min/max from the bound mode (apply substitutes the bound
      when the score is inside it; clip pins the range to the bound;
      ignore keeps min/max);
    - clip mode maps out-of-bound scores straight to 0.001 / 1.0;
    - (s - emin)/(emax - emin), ==0 → 0.001; emax==emin → 1.0.
    """
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    mn, mx = s.min(), s.max()

    def bound_cfg(b, default_score):
        if b is None:
            return False, "apply", default_score
        return True, b.get("mode", "apply") or "apply", float(
            b.get("min_score", b.get("max_score", default_score))
            if ("min_score" in b or "max_score" in b)
            else default_score
        )

    lo_on, lo_mode, lo_val = bound_cfg(lower_bound, 0.0)
    up_on, up_mode, up_val = bound_cfg(upper_bound, 1.0)

    # effective min (LowerBound.determineEffectiveScore)
    if not lo_on or lo_mode == "ignore":
        emin = np.full(s.shape, mn)
    elif lo_mode == "apply":
        emin = np.where((mx > lo_val) & (s > lo_val), lo_val, mn)
    else:  # clip
        emin = np.full(s.shape, mn if mx < lo_val else lo_val)
    # effective max (UpperBound.determineEffectiveScore)
    if not up_on or up_mode == "ignore":
        emax = np.full(s.shape, mx)
    elif up_mode == "apply":
        emax = np.where((mn < up_val) & (s < up_val), up_val, mx)
    else:  # clip
        emax = np.full(s.shape, mx if mn > up_val else up_val)

    denom = emax - emin
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(denom == 0.0, SINGLE_RESULT_SCORE, (s - emin) / denom)
    out[out == 0.0] = MIN_SCORE
    if lo_on and lo_mode == "clip":
        out = np.where(s < emin, MIN_SCORE, out)
    if up_on and up_mode == "clip":
        out = np.where(s > emax, 1.0, out)
    out[(s == mn) & (s == mx)] = SINGLE_RESULT_SCORE
    return out


def norm_l2(scores: np.ndarray) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    norm = np.sqrt((s * s).sum())
    if norm == 0:
        return np.full(s.shape, MIN_SCORE)
    return s / norm


def norm_z_score(scores: np.ndarray) -> np.ndarray:
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    mean = s.mean()
    # Sample (n-1) std, matching Commons-Math DescriptiveStatistics
    # .getStandardDeviation(); a single result has std 0.
    std = np.sqrt(((s - mean) ** 2).sum() / (s.size - 1)) if s.size > 1 else 0.0
    mx, mn = s.max(), s.min()
    if std == 0.0:
        return np.where(s == mean, mx, mn)
    n = (s - mean) / std
    out = np.where(n <= 0.0, MIN_SCORE, n)
    out[s == mean] = mx
    return out


def _rrf_value(rank: int, rank_constant: int) -> float:
    return float(
        (Decimal(1) / Decimal(rank_constant + rank)).quantize(
            Decimal("1e-10"), rounding=ROUND_HALF_UP
        )
    )


def norm_rrf(
    scores: np.ndarray,
    doc_ids: np.ndarray | None = None,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
) -> np.ndarray:
    """Rank-based: 1/(rank_constant + rank). Ranks by (score desc, doc asc)."""
    if not 1 <= rank_constant <= 10_000:
        raise ValueError("rank_constant must be in [1, 10000]")
    s = np.asarray(scores, dtype=np.float64)
    if s.size == 0:
        return s
    if doc_ids is None:
        doc_ids = np.arange(s.size)
    order = np.lexsort((np.asarray(doc_ids), -s))
    out = np.empty(s.size, dtype=np.float64)
    for pos, idx in enumerate(order):
        out[idx] = _rrf_value(pos + 1, rank_constant)
    return out


NORMALIZATION_TECHNIQUES = {
    "min_max": norm_min_max,
    "l2": norm_l2,
    "z_score": norm_z_score,
    "rrf": norm_rrf,
}


def normalize_scores(technique: str, scores: np.ndarray, **kwargs) -> np.ndarray:
    return NORMALIZATION_TECHNIQUES[technique](scores, **kwargs)
