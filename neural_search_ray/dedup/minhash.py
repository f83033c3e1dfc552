"""MinHash + LSH near-duplicate detection.

Pipeline shape (Ray-Data-first): ``map_batches`` computes per-doc minhash
signatures (shingle → h64 → k universal hashes → min), emits one row per
(band, band_key); a ``groupby(band, band_key)`` collects bucket members;
pairs sharing any band bucket are near-dup candidates. The shuffle moves
(band_key, doc_id) scalars only.

Determinism: h64 = md5-lower (SQL-oracle-identical); universal hashes
(a_i·h + b_i) mod 2^61-1 with fixed seeds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..analysis.analyzer import tokenize
from .common import MERSENNE_61, h64, word_shingles

# fixed coefficients (deterministic, shared with the SQL oracle)
DEFAULT_NUM_HASHES = 8
_A = [
    1610612741, 805306457, 402653189, 201326611,
    100663319, 50331653, 25165843, 12582917,
]
_B = [
    2971215073, 1451730773, 920419823, 479001599,
    268435399, 141650963, 86028121, 49979687,
]


class MinHasher:
    def __init__(self, num_hashes: int = DEFAULT_NUM_HASHES, shingle_size: int = 3):
        if num_hashes > len(_A):
            raise ValueError(f"at most {len(_A)} hash functions supported")
        self.num_hashes = num_hashes
        self.shingle_size = shingle_size
        self.a = _A[:num_hashes]
        self.b = _B[:num_hashes]

    def signature(self, text: str) -> list[int]:
        """MinHash signature; empty docs get sentinel MERSENNE_61."""
        shingles = word_shingles(tokenize(text or ""), self.shingle_size)
        if not shingles:
            return [MERSENNE_61] * self.num_hashes
        hs = [h64(s) for s in set(shingles)]
        return [
            min((a * h + b) % MERSENNE_61 for h in hs)
            for a, b in zip(self.a, self.b)
        ]


def make_signature_stage(
    hasher: MinHasher, bands: int, id_col: str = "doc_id", text_col: str = "text"
):
    """map_batches fn → rows (band, band_key, doc_id); rows_per_band =
    num_hashes // bands signature values hashed into one band key."""
    rows_per_band = hasher.num_hashes // bands
    if rows_per_band * bands != hasher.num_hashes:
        raise ValueError("bands must divide num_hashes")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        out_band, out_key, out_id = [], [], []
        for doc_id, text in zip(ids, batch[text_col].to_pylist()):
            sig = hasher.signature(text)
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                key = h64(",".join(map(str, chunk)))
                out_band.append(band)
                out_key.append(key)
                out_id.append(doc_id)
        return pa.table(
            {
                "band": pa.array(out_band, type=pa.int32()),
                "band_key": pa.array(np.asarray(out_key, dtype=np.uint64)),
                "doc_id": pa.array(out_id, type=pa.int64()),
            }
        )

    return fn


def minhash_lsh_candidates(
    ds: "ray.data.Dataset",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = 4,
    shingle_size: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """→ Dataset(doc_a, doc_b) DISTINCT candidate near-dup pairs
    (doc_a < doc_b) sharing at least one LSH band bucket."""
    hasher = MinHasher(num_hashes, shingle_size)
    sigs = ds.map_batches(
        make_signature_stage(hasher, bands, id_col, text_col),
        batch_format="pyarrow",
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(group["doc_id"].to_numpy())
        if ids.size < 2:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64())})
        ii, jj = np.triu_indices(ids.size, k=1)
        return pa.table({"doc_a": pa.array(ids[ii]), "doc_b": pa.array(ids[jj])})

    pairs = sigs.groupby(["band", "band_key"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
    # distinct pairs (a pair may collide in several bands)
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands")
    ).select_columns(["doc_a", "doc_b"])
