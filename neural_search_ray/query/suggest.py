"""Phrase suggester ("did-you-mean" over multi-token input).

Reference parity: the OpenSearch phrase suggester (PhraseSuggester /
NoisyChannelSpellChecker) — candidate corrections generated per token
from the term dictionary, whole-phrase candidates scored by a language
model times an error model. Restated deterministically here:

- candidate generation: per token, dictionary terms within
  ``max_edits`` plain Levenshtein, ranked (distance asc, df desc,
  term asc), top ``per_token`` — identical keys to the term suggester,
  and the input token itself stays a candidate (distance 0);
- language model: the corpus-fit unigram LM (textstats/lm.py) —
  ln P(phrase) = Σ ln p(tᵢ);
- error model: ``edit_penalty`` (default ln ½) per edit — the noisy-
  channel prior that each correction halves the likelihood;
- score = Σ ln p(candᵢ) + edit_penalty · Σ editsᵢ, the exact input
  phrase excluded, top ``size`` by (score desc rounded half-up 6,
  phrase asc).

A token with NO dictionary candidate stays fixed and contributes the
LM floor (min ln p − ln 2) — the held-out smoothing convention.
"""

from __future__ import annotations

import math

import numpy as np

from .engine import levenshtein

__all__ = ["suggest_phrase"]


def _round6(x: float) -> float:
    return (
        math.floor(x * 1e6 + 0.5) / 1e6
        if x >= 0
        else math.ceil(x * 1e6 - 0.5) / 1e6
    )


def suggest_phrase(
    searcher,
    vocab: dict,
    lnp: np.ndarray,
    text: str,
    *,
    size: int = 3,
    max_edits: int = 1,
    per_token: int = 5,
    edit_penalty: float | None = None,
) -> list[tuple[str, float]]:
    """Top ``size`` corrected phrases for ``text``. ``vocab``/``lnp``
    come from textstats/lm.py fit_unigram_lm (broadcast once at query
    serving). Returns [(phrase, score)], best first."""
    from ..analysis.analyzer import tokenize

    if edit_penalty is None:
        edit_penalty = math.log(0.5)
    tokens = tokenize(text)
    if not tokens:
        return []
    floor = float(np.min(lnp) - math.log(2.0)) if len(lnp) else 0.0
    per_tok_cands: list[list[tuple[str, float, int]]] = []
    for tok in tokens:
        cands = searcher.expand_fuzzy(tok, max_edits, 0)
        scored = sorted(
            (levenshtein(tok, t), -searcher.local_df(t), t) for t in cands
        )[:per_token]
        if not scored:
            per_tok_cands.append([(tok, floor, 0)])
            continue
        per_tok_cands.append(
            [
                (t, float(lnp[vocab[t]]) if t in vocab else floor, d)
                for d, _, t in scored
            ]
        )

    # cross product (bounded by per_token^len(tokens); callers keep
    # phrases short — the suggester is a query-time feature, not a
    # corpus scan)
    phrases: list[tuple[str, ...]] = [()]
    for cands in per_tok_cands:
        phrases = [p + (c[0],) for p in phrases for c in cands]
    lookup = [
        {c[0]: c for c in cands} for cands in per_tok_cands
    ]
    orig = tuple(tokens)
    out = []
    for p in phrases:
        if p == orig:
            continue
        score = 0.0
        edits = 0
        for i, t in enumerate(p):
            _, lp, d = lookup[i][t]
            score += lp
            edits += d
        out.append((" ".join(p), _round6(score + edit_penalty * edits)))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:size]
