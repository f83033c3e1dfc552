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
    """(a*h + b) mod (2^61 - 1) — exact in Python ints / SQL HUGEINT."""
    hv = np.asarray(h, dtype=np.uint64)
    return np.fromiter(
        ((a * int(x) + b) % MERSENNE_61 for x in hv), dtype=np.uint64, count=hv.size
    )


def word_shingles(tokens: list[str], n: int = 3) -> list[str]:
    """n-word shingles joined by a single space."""
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
