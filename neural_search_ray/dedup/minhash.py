"""MinHash + LSH near-duplicate detection.

Pipeline shape (Ray-Data-first): ``map_batches`` computes per-doc minhash
signatures (shingle → h64 → k universal hashes → min), emits one row per
(band, band_key); a ``groupby(band, band_key)`` collects bucket members;
pairs sharing any band bucket are near-dup candidates. The shuffle moves
(band_key, doc_id) scalars only.

Vectorized signature kernel (the round-1 per-doc Python loop is gone):
the whole batch is tokenized with the Arrow C++ analyzer fast path,
3-gram shingles are built with one ``binary_join_element_wise`` over the
flat token array, shingles are DISTINCT-ed per doc via dictionary-encode
+ np.unique, md5 runs once per UNIQUE shingle in the batch, the k
universal hashes are exact vectorized uint64 modular arithmetic
(common.universal_hash), and per-doc minima come from
``np.minimum.reduceat`` over doc segments. Only the per-unique-shingle
md5 and the per-(doc, band) key md5 remain Python calls — both are
required for the exact DuckDB ``md5_number_lower`` oracle.

Determinism: h64 = md5-lower (SQL-oracle-identical); universal hashes
(a_i·h + b_i) mod 2^61-1 with fixed coefficients; num_hashes beyond the
8 pinned coefficient pairs extends them from a fixed-seed PRNG (same
stream on the SQL-generation side, so any num_hashes keeps its oracle).

Robustness at scale: ``max_bucket`` caps candidate-pair generation in a
degenerate hot bucket (all-equal band keys would otherwise explode
O(m²)); empty-shingle docs share a sentinel signature and land in one
such bucket, so cap or pre-filter empty docs in web-scale runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..analysis.analyzer import analyze_column, tokenize
from ..config import AnalyzerConfig
from .common import MERSENNE_61, h64, universal_hash, word_shingles

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


def coefficients(num_hashes: int) -> tuple[list[int], list[int]]:
    """First 8 pairs are the pinned constants; beyond that, a fixed-seed
    PRNG stream (a odd in [1, 2^31), b in [0, 2^32)) — deterministic, so
    the SQL-oracle generator can reproduce any num_hashes."""
    a, b = list(_A), list(_B)
    if num_hashes > len(a):
        rng = np.random.RandomState(0x5EED)
        while len(a) < num_hashes:
            a.append(int(rng.randint(1, 1 << 31)) | 1)
            b.append(int(rng.randint(0, 1 << 31) * 2 + rng.randint(0, 2)))
    return a[:num_hashes], b[:num_hashes]


class MinHasher:
    def __init__(self, num_hashes: int = DEFAULT_NUM_HASHES, shingle_size: int = 3):
        self.num_hashes = num_hashes
        self.shingle_size = shingle_size
        self.a, self.b = coefficients(num_hashes)

    def signature(self, text: str) -> list[int]:
        """Scalar reference form (tests); empty docs get sentinel
        MERSENNE_61. The batch kernel below must match exactly."""
        shingles = word_shingles(tokenize(text or ""), self.shingle_size)
        if not shingles:
            return [MERSENNE_61] * self.num_hashes
        hs = np.fromiter(
            (h64(s) for s in set(shingles)), dtype=np.uint64, count=len(set(shingles))
        )
        return [
            int(universal_hash(hs, a, b).min()) for a, b in zip(self.a, self.b)
        ]

    def signature_matrix(
        self, texts: pa.Array, analyzer_cfg: AnalyzerConfig = AnalyzerConfig()
    ) -> np.ndarray:
        """Vectorized batch form → (n_docs, num_hashes) uint64 matrix.
        See module docstring for the kernel shape."""
        n = self.shingle_size
        tok_lists = analyze_column(texts, analyzer_cfg)
        offs = tok_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        lens = np.diff(offs)
        n_docs = lens.size
        sig = np.full((n_docs, self.num_hashes), MERSENNE_61, dtype=np.uint64)
        flat = tok_lists.flatten()
        total = len(flat)

        shingle_arrays: list[pa.Array] = []
        doc_arrays: list[np.ndarray] = []
        # full n-gram windows (docs with >= n tokens), one vectorized join
        if total >= n:
            parts = [flat.slice(i, total - n + 1) for i in range(n)]
            joined = pc.binary_join_element_wise(*parts, " ")
            win_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lens)[: total - n + 1]
            valid = win_doc == np.repeat(np.arange(n_docs, dtype=np.int64), lens)[n - 1 :]
            if valid.any():
                sel = np.flatnonzero(valid)
                shingle_arrays.append(joined.take(pa.array(sel)))
                doc_arrays.append(win_doc[sel])
        # short docs (0 < len < n): the whole token list is one shingle
        short = np.flatnonzero((lens > 0) & (lens < n))
        if short.size:
            short_lists = tok_lists.take(pa.array(short))
            shingle_arrays.append(pc.binary_join(short_lists, " "))
            doc_arrays.append(short)
        if not shingle_arrays:
            return sig
        shingles = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a in shingle_arrays]
        )
        sdoc = np.concatenate(doc_arrays)
        # per-doc DISTINCT shingles
        denc = shingles.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = denc.dictionary
        pair = np.unique(sdoc * len(uniq) + codes)
        row_doc = pair // len(uniq)
        row_code = pair % len(uniq)
        # md5 once per UNIQUE shingle in the batch
        uniq_h = np.fromiter(
            (h64(s) for s in uniq.to_pylist()), dtype=np.uint64, count=len(uniq)
        )
        row_h = uniq_h[row_code]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(row_doc) != 0) + 1))
        seg_docs = row_doc[starts]
        for i, (a, b) in enumerate(zip(self.a, self.b)):
            hv = universal_hash(row_h, a, b)
            sig[seg_docs, i] = np.minimum.reduceat(hv, starts)
        return sig


_KR_BASE = np.uint64(131)


def band_keys_mix(sig: np.ndarray, bands: int) -> np.ndarray:
    """Vectorized band keys: Karp-Rabin polynomial chain
    ``acc = acc*131 + m  (mod 2^64)`` over each band's signature slice,
    seeded with 1.  rows_per_band numpy ops total (no per-row Python) —
    the scale-grade replacement for the md5-of-ASCII-join key.  The same
    chain is HUGEINT-expressible in DuckDB (products stay < 2^71, the
    winnow-roll pattern), so the variant keeps an exact SQL oracle.
    → (n_docs * bands,) uint64, laid out doc-major (matches np.tile/repeat
    emission order in the signature stage)."""
    n_docs = sig.shape[0]
    rpb = sig.shape[1] // bands
    chunks = sig.reshape(n_docs, bands, rpb)
    acc = np.ones((n_docs, bands), dtype=np.uint64)
    for r in range(rpb):
        acc = acc * _KR_BASE + chunks[:, :, r]
    return acc.reshape(-1)


def make_signature_stage(
    hasher: MinHasher,
    bands: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "md5",
):
    """map_batches fn → rows (band, band_key, doc_id); rows_per_band =
    num_hashes // bands signature values hashed into one band key.

    ``key`` selects the band-key kernel: ``"md5"`` is the original
    md5-of-ASCII-join (exact parity with the md5_number_lower SQL oracle,
    but a per-(doc, band) Python loop); ``"mix"`` is the fully vectorized
    Karp-Rabin chain (band_keys_mix) with its own HUGEINT SQL oracle —
    use it at scale."""
    rows_per_band = hasher.num_hashes // bands
    if rows_per_band * bands != hasher.num_hashes:
        raise ValueError("bands must divide num_hashes")
    if key not in ("md5", "mix"):
        raise ValueError(f"unknown band-key kernel: {key!r}")

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sig = hasher.signature_matrix(col)
        n_docs = ids.size
        if key == "mix":
            keys = band_keys_mix(sig, bands)
        else:
            md5 = hashlib.md5
            keys = np.empty(n_docs * bands, dtype=np.uint64)
            pos = 0
            for d in range(n_docs):
                row = sig[d]
                for band in range(bands):
                    chunk = row[band * rows_per_band : (band + 1) * rows_per_band]
                    s = ",".join(map(str, chunk.tolist()))
                    keys[pos] = int.from_bytes(
                        md5(s.encode()).digest()[8:16], "little"
                    )
                    pos += 1
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n_docs)
                ),
                "band_key": pa.array(keys),
                "doc_id": pa.array(np.repeat(ids, bands)),
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
    max_bucket: int | None = None,
    key: str = "md5",
) -> "ray.data.Dataset":
    """→ Dataset(doc_a, doc_b) DISTINCT candidate near-dup pairs
    (doc_a < doc_b) sharing at least one LSH band bucket.

    ``max_bucket`` (None = unlimited, required for exact SQL-oracle
    parity) bounds pair generation per bucket to the ``max_bucket``
    smallest doc_ids — set it in web-scale runs so a degenerate bucket
    (e.g. the empty-doc sentinel) cannot emit O(m²) pairs.

    ``key`` picks the band-key kernel (see make_signature_stage):
    ``"mix"`` is the vectorized scale path, ``"md5"`` the original."""
    hasher = MinHasher(num_hashes, shingle_size)
    sigs = ds.map_batches(
        make_signature_stage(hasher, bands, id_col, text_col, key=key),
        batch_format="pyarrow",
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """Vectorized all-pairs over a SALT bucket holding many
        (band, band_key) groups: one Python call per salt bucket. For
        each element at rank r within its group (doc-sorted, deduped,
        capped at max_bucket), emit r pairs against the r preceding
        docs — the standard segmented pair-expansion, all numpy."""
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64())})
        band = group["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = group["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if doc.size == 0:
            return empty
        order = np.lexsort((doc, key, band))
        band, key, doc = band[order], key[order], doc[order]
        # dedup identical (band, key, doc) triples (same doc from several blocks)
        keep = np.empty(doc.size, dtype=bool)
        keep[0] = True
        keep[1:] = (
            (band[1:] != band[:-1]) | (key[1:] != key[:-1]) | (doc[1:] != doc[:-1])
        )
        band, key, doc = band[keep], key[keep], doc[keep]
        g_new = np.empty(doc.size, dtype=bool)
        g_new[0] = True
        g_new[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        gidx = np.cumsum(g_new) - 1
        starts = np.flatnonzero(g_new)
        rank = np.arange(doc.size) - starts[gidx]
        if max_bucket is not None:
            capped = rank < max_bucket
            doc, gidx = doc[capped], gidx[capped]
            if doc.size == 0:
                return empty
            g_new = np.concatenate(([True], gidx[1:] != gidx[:-1]))
            gidx = np.cumsum(g_new) - 1
            starts = np.flatnonzero(g_new)
            rank = np.arange(doc.size) - starts[gidx]
        total = int(rank.sum())
        if total == 0:
            return empty
        # expand: element i (rank r_i) contributes r_i pairs as doc_b
        b_pos = np.repeat(np.arange(doc.size), rank)
        excl = np.concatenate(([0], np.cumsum(rank)[:-1]))
        offs = np.arange(total) - np.repeat(excl, rank)
        a_pos = starts[gidx[b_pos]] + offs
        return pa.table({"doc_a": pa.array(doc[a_pos]), "doc_b": pa.array(doc[b_pos])})

    num_salt = 256
    sigs = sigs.map_batches(
        lambda b: b.append_column(
            "salt",
            pa.array(
                (
                    b["band_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    % num_salt
                ).astype(np.int64)
            ),
        ),
        batch_format="pyarrow",
    )
    pairs = sigs.groupby("salt").map_groups(bucket_pairs, batch_format="pyarrow")
    # distinct pairs (a pair may collide in several bands)
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands")
    ).select_columns(["doc_a", "doc_b"])
