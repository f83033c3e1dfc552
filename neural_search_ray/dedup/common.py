"""Shared hashing for dedup operators.

``h64(s)`` is the 64-bit content hash used everywhere: the LOWER 8 bytes
of md5(s) as a little-endian uint64 — chosen because DuckDB 1.0 exposes
the identical function as ``md5_number_lower(s)``, so every dedup
operator has an exact SQL oracle.
"""

from __future__ import annotations

import hashlib

import numpy as np

MERSENNE_61 = (1 << 61) - 1


def h64(s: str) -> int:
    """uint64 md5-lower hash; equals DuckDB md5_number_lower(s)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def h64_batch(strings: list[str]) -> np.ndarray:
    return np.fromiter((h64(s) for s in strings), dtype=np.uint64, count=len(strings))


def universal_hash(h: np.ndarray, a: int, b: int) -> np.ndarray:
    """(a*h + b) mod (2^61 - 1), vectorized and EXACT (bit-identical to
    Python-int / SQL HUGEINT arithmetic): the 128-bit product a*h is
    decomposed into 63-bit-safe uint64 pieces and folded with
    2^61 = 1 (mod M). Preconditions: a < 2^31, b < 2^32."""
    assert 0 < a < (1 << 31) and 0 <= b < (1 << 32)
    hv = np.asarray(h, dtype=np.uint64)
    M = np.uint64(MERSENNE_61)
    av = np.uint64(a)
    h_lo = hv & np.uint64(0xFFFFFFFF)
    h_hi = hv >> np.uint64(32)
    p_hi = av * h_hi  # < 2^63
    p_lo = av * h_lo  # < 2^63
    # p_hi * 2^32 mod M: p_hi = q*2^29 + r, so q*2^61 + r*2^32 = q + r*2^32
    q = p_hi >> np.uint64(29)
    r = p_hi & np.uint64((1 << 29) - 1)
    x = q + (r << np.uint64(32)) + p_lo + np.uint64(b)  # < 2^64, no overflow
    x = (x & M) + (x >> np.uint64(61))
    x = (x & M) + (x >> np.uint64(61))
    return np.where(x >= M, x - M, x).astype(np.uint64)


def word_shingles(tokens: list[str], n: int = 3) -> list[str]:
    """n-word shingles joined by a single space."""
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
