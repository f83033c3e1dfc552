"""N-gram Jaccard similarity between documents.

``ngram_jaccard(a, b, n)`` = |S_a ∩ S_b| / |S_a ∪ S_b| over distinct
n-word shingle sets. Used for verifying LSH candidate pairs (the exact
check after the approximate bucket stage).
"""

from __future__ import annotations

from ..analysis.analyzer import tokenize
from .common import word_shingles


def ngram_jaccard(text_a: str, text_b: str, n: int = 2) -> float:
    sa = set(word_shingles(tokenize(text_a or ""), n))
    sb = set(word_shingles(tokenize(text_b or ""), n))
    union = len(sa | sb)
    return len(sa & sb) / union if union else 0.0
