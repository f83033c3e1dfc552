"""SimHash document fingerprinting (32-bit).

Per doc: for each distinct term with tf weight, take the 32 low bits of
h64(term); accumulate +tf where the bit is 1 and −tf where 0; the
fingerprint sets bit j iff the accumulated sum > 0. Near-dups have small
Hamming distance. All term-bit accumulation is vectorized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.analyzer import tokenize
from .common import h64

SIMHASH_BITS = 32


def simhash32(text: str) -> int:
    toks = tokenize(text or "")
    if not toks:
        return 0
    terms, tfs = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    hs = np.fromiter((h64(t) & 0xFFFFFFFF for t in terms), dtype=np.uint64, count=terms.size)
    bits = (hs[:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
    contrib = np.where(bits == 1, tfs[:, None], -tfs[:, None]).sum(axis=0)
    fp = np.where(contrib > 0, 1, 0)
    return int((fp << np.arange(SIMHASH_BITS)).sum())


def simhash_stage(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    ids = batch[id_col]
    fps = [simhash32(t) for t in batch[text_col].to_pylist()]
    return pa.table({id_col: ids, "simhash": pa.array(fps, type=pa.int64())})
