"""Temperature-scaled source mixing — the multi-domain training-mix
primitive (alpha-smoothed domain sampling, as used to rebalance
multi-source/multilingual LM training corpora): per-source sampling
weight ∝ count^alpha (alpha < 1 upweights small sources), normalized so
the expected kept fraction of the WHOLE corpus hits a target, applied
as a deterministic per-row hash gate.

Ray-Data-first shape: one tiny groupby(source).count() exchange
(bounded by source cardinality) fixes the per-source keep rates on the
driver; the corpus then streams through ONE stateless map_batches
filter — no shuffle, no driver-side row handling, reproducible and
resumable (the gate depends only on (doc_id, salt), so re-executed
blocks keep identical rows; the same property makes incremental re-runs
consistent with earlier samples).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..dedup.common import h64_batch

_MASK63 = np.int64(0x7FFF_FFFF_FFFF_FFFF)
_PPM = 1_000_000


def source_mix_rates(
    counts: dict[str, int], target_frac: float, alpha: float = 0.5
) -> dict[str, int]:
    """Per-source keep rates in parts-per-million.

    rate_s = min(1, (target_frac·N) · √-smoothed weight share / cnt_s),
    i.e. expected kept rows per source ∝ cnt_s^alpha while the expected
    TOTAL kept fraction is target_frac (exactly, when no source
    saturates at rate 1). Rates are rounded half-up at 6 decimals and
    scaled to integer ppm so an engine-external oracle computing the
    same expression lands on the same integers. The weight sum runs in
    source-name order — with a handful of sources the float error is
    far below the rounding grain either way."""
    n_total = sum(counts.values())
    w = {s: math.sqrt(c) if alpha == 0.5 else float(c) ** alpha
         for s, c in counts.items()}
    w_sum = sum(w[s] for s in sorted(w))
    out = {}
    for s, c in counts.items():
        rate = min(1.0, (target_frac * n_total) * w[s] / w_sum / c)
        f = 1e6
        out[s] = int(math.floor(rate * f + 0.5))  # round6 → exact ppm
    return out


def source_mix_sample(
    ds,
    *,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_frac: float = 0.5,
    alpha: float = 0.5,
    salt: str = "mix1",
):
    """(id, source) rows of the temperature-mixed sample. Two streaming
    passes over the lazy input: the counts exchange (rows = source
    cardinality) and the gate filter (no exchange at all)."""
    counts_rows = ds.groupby(source_col).count().take_all()
    counts = {r[source_col]: int(r["count()"]) for r in counts_rows}
    ppm = source_mix_rates(counts, target_frac, alpha)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        src = batch[source_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        denc = src.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = denc.dictionary.to_pylist()
        rate_by_code = np.asarray(
            [ppm.get(u, 0) for u in uniq], dtype=np.int64
        )
        h = (h64_batch([f"{d}{salt}" for d in ids]).astype(np.uint64)
             & np.uint64(_MASK63)).astype(np.int64)
        m = (h % _PPM) < rate_by_code[codes]
        return pa.table(
            {
                id_col: pa.array(ids[m]),
                source_col: src.take(np.flatnonzero(m)),
            }
        )

    return ds.map_batches(keep, batch_format="pyarrow")
