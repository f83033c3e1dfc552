"""Sparse-vector prune strategies (4 + split variant).

Behavior re-specified from util/prune/PruneUtils.java:34-201 (NOT copied):

- ``top_k``      : keep the k largest values.
- ``max_ratio``  : keep values >= ratio * max(values).
- ``abs_value``  : keep values >= threshold.
- ``alpha_mass`` : sort desc, keep while cumulative sum (incl. current)
                   <= alpha * total sum.
- ``split_sparse_vector`` returns (kept, pruned) — used by the two-phase
  query processor (processor/NeuralSparseTwoPhaseProcessor.java:44-180).

Pinned tie-break (the reference's HashMap iteration order is
non-deterministic; our oracle defines it): ordering is always
(value desc, token asc).
"""

from __future__ import annotations

PRUNE_TYPES = ("top_k", "max_ratio", "abs_value", "alpha_mass")


def _sorted_items(vec: dict[str, float]) -> list[tuple[str, float]]:
    return sorted(vec.items(), key=lambda kv: (-kv[1], kv[0]))


def split_sparse_vector(
    prune_type: str, prune_ratio: float, vec: dict[str, float]
) -> tuple[dict[str, float], dict[str, float]]:
    """Split a token→weight map into (kept, pruned) by the given strategy."""
    if prune_type not in PRUNE_TYPES:
        raise ValueError(f"unknown prune type {prune_type!r}; one of {PRUNE_TYPES}")
    if any(v <= 0 for v in vec.values()):
        raise ValueError("pruned values must be positive")
    if not vec:
        return {}, {}

    if prune_type == "top_k":
        items = _sorted_items(vec)
        k = int(prune_ratio)
        return dict(items[:k]), dict(items[k:])

    if prune_type == "max_ratio":
        mx = max(vec.values())
        thresh = prune_ratio * mx
        kept = {t: v for t, v in vec.items() if v >= thresh}
        return kept, {t: v for t, v in vec.items() if t not in kept}

    if prune_type == "abs_value":
        kept = {t: v for t, v in vec.items() if v >= prune_ratio}
        return kept, {t: v for t, v in vec.items() if t not in kept}

    # alpha_mass
    total = sum(vec.values())
    budget = prune_ratio * total
    kept: dict[str, float] = {}
    pruned: dict[str, float] = {}
    acc = 0.0
    for t, v in _sorted_items(vec):
        acc += v
        if acc <= budget:
            kept[t] = v
        else:
            pruned[t] = v
    return kept, pruned


def prune_sparse_vector(
    prune_type: str, prune_ratio: float, vec: dict[str, float]
) -> dict[str, float]:
    return split_sparse_vector(prune_type, prune_ratio, vec)[0]
