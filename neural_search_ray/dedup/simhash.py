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
    """Batch-vectorized: one analyze_column pass, md5 once per UNIQUE
    term in the batch, per-doc bit accumulation via reduceat — matches
    simhash32 exactly (pytest parity)."""
    from ..stages.tfvec import doc_term_tf

    n = batch.num_rows
    doc_idx, codes, tfs, uniques = doc_term_tf(
        batch, id_column=id_col, text_column=text_col
    )
    fps = np.zeros(n, dtype=np.int64)
    if codes.size:
        uniq_h = np.fromiter(
            (h64(t) & 0xFFFFFFFF for t in uniques.to_pylist()),
            dtype=np.uint64, count=len(uniques),
        )
        bits = (
            uniq_h[codes][:, None] >> np.arange(SIMHASH_BITS, dtype=np.uint64)
        ) & np.uint64(1)
        contrib = np.where(bits == 1, tfs[:, None], -tfs[:, None])
        starts = np.concatenate(([0], np.flatnonzero(np.diff(doc_idx) != 0) + 1))
        sums = np.add.reduceat(contrib, starts, axis=0)
        fp_bits = (sums > 0).astype(np.int64)
        fps[doc_idx[starts]] = fp_bits @ (1 << np.arange(SIMHASH_BITS, dtype=np.int64))
    return pa.table({id_col: batch[id_col], "simhash": pa.array(fps)})
