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


SIMHASH_BANDS = 4  # 4 bands × 8 bits over the 32-bit fingerprint
SIMHASH_DEFAULT_MAX_HAMMING = 3


def simhash_lsh_pairs(
    ds: "object",
    max_hamming: int = SIMHASH_DEFAULT_MAX_HAMMING,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 2048,
) -> "object":
    """SimHash near-dup candidate pairs via banded hamming LSH.

    The classic simhash dedup pipeline (Manku et al. WWW'07 shape): any
    two fingerprints within ``max_hamming`` of each other must agree
    EXACTLY on at least one of the 4 disjoint 8-bit bands whenever
    max_hamming < 4 (pigeonhole) — so grouping by (band, band_bits)
    finds every such pair with no all-pairs scan. Within a bucket the
    hamming check is one vectorized XOR + popcount over the bucket's
    fingerprint vector; pairs found in several bands are deduped by a
    final groupby on (doc_a, doc_b) (pair count is output-sized,
    not corpus-sized). ``max_bucket`` caps degenerate buckets (e.g.
    simhash 0 from empty docs) like dedup/minhash.py does.

    Returns a Dataset of (doc_a, doc_b, hamming), doc_a < doc_b.
    """
    import ray.data  # noqa: F401  (ds is a ray.data.Dataset)

    if max_hamming >= SIMHASH_BANDS:
        raise ValueError(
            f"banded LSH guarantees full recall only for max_hamming < "
            f"{SIMHASH_BANDS} (pigeonhole over {SIMHASH_BANDS} bands); got "
            f"{max_hamming}"
        )

    def to_bands(batch: pa.Table) -> pa.Table:
        fps = simhash_stage(batch, id_col=id_col, text_col=text_col)
        ids = fps[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = fps["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = ids.size
        bands = np.tile(np.arange(SIMHASH_BANDS, dtype=np.int64), n)
        rep_h = np.repeat(h, SIMHASH_BANDS)
        keys = (rep_h >> (bands.astype(np.uint64) * np.uint64(8))) & np.uint64(0xFF)
        return pa.table(
            {
                "band": pa.array(bands),
                "band_key": pa.array(keys.astype(np.int64)),
                id_col: pa.array(np.repeat(ids, SIMHASH_BANDS)),
                "simhash": pa.array(np.repeat(h.astype(np.int64), SIMHASH_BANDS)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = group["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(ids)
        ids, h = ids[order], h[order]
        if ids.size > max_bucket:  # degenerate bucket cap (documented)
            ids, h = ids[:max_bucket], h[:max_bucket]
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int64())}
        )
        if ids.size < 2:
            return empty
        ii, jj = np.triu_indices(ids.size, k=1)
        x = h[ii] ^ h[jj]
        # vectorized popcount of the 32-bit xor via 4 byte-table lookups
        ham = _POPCNT8[x & 0xFF] + _POPCNT8[(x >> 8) & 0xFF] \
            + _POPCNT8[(x >> 16) & 0xFF] + _POPCNT8[(x >> 24) & 0xFF]
        keep = ham <= max_hamming
        if not keep.any():
            return empty
        a, b = ids[ii[keep]], ids[jj[keep]]
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "hamming": pa.array(ham[keep].astype(np.int64)),
            }
        )

    def first_of_pair(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    # cross-band dedup groups on BOTH id columns (a packed single-int
    # pair id would silently collide once doc ids reach 2^31)
    return (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby(["band", "band_key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .map_groups(first_of_pair, batch_format="pyarrow")
    )


_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint64)


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
