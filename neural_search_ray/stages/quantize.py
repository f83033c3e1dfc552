"""Byte quantization + Lucene FeatureField value encoding.

Re-specified from the reference (semantics matched, code not copied):

- ``byte_quantize`` — sparse/quantization/ByteQuantizer.java:24-34:
  float in [0, ceil] → u8 in 0..255 by round-half-up of v*255/ceil after
  clipping; ingest ceiling default 3.0, search ceiling 16.0
  (sparse/common/SparseConstants.java:34-35).
- ``feature_encode``/``feature_decode`` — sparse/common/ValueEncoder.java:21-42
  (Lucene FeatureField convention): weight float → term "frequency" by
  float32 bit pattern >>> 15; decode shifts back (lossy: keeps the top
  16 bits of the float, i.e. sign+exponent+7 mantissa bits).
"""

from __future__ import annotations

import numpy as np

INGEST_CEILING = 3.0
SEARCH_CEILING = 16.0


def byte_quantize(values: np.ndarray, ceiling: float = INGEST_CEILING) -> np.ndarray:
    """float array in [0, ceiling] → uint8 0..255 (round-half-up)."""
    v = np.clip(np.asarray(values, dtype=np.float64), 0.0, ceiling)
    return np.floor(v * 255.0 / ceiling + 0.5).astype(np.uint8)


def byte_dequantize(q: np.ndarray, ceiling: float = INGEST_CEILING) -> np.ndarray:
    return np.asarray(q, dtype=np.float64) * ceiling / 255.0


def feature_encode(weights: np.ndarray) -> np.ndarray:
    """float32 weight → int term-freq: floatToIntBits(w) >>> 15 (must be > 0)."""
    bits = np.asarray(weights, dtype=np.float32).view(np.int32)
    if (bits < 0).any():
        raise ValueError("feature weights must be positive")
    return (bits >> 15).astype(np.int64)


def feature_decode(freqs: np.ndarray) -> np.ndarray:
    """int term-freq → float32 weight (top-16-bit approximation)."""
    bits = (np.asarray(freqs, dtype=np.int64) << 15).astype(np.int32)
    return bits.view(np.float32)
