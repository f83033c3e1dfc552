"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the north-rule input table (BASELINE.json input_hint):
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. Content is a pure function of (seed, doc_id) computed
with a vectorized splitmix64 counter hash — batch and partition
boundaries do NOT affect output, so any run at any parallelism generates
byte-identical pages (required for resumable builds with deterministic
docIDs, SURVEY.md §7.4) — and generation is numpy-vectorized across the
whole batch (no per-doc RNG objects).

The token-rank distribution is Zipf-like (P(rank >= r) = r^-0.3),
including stopword-grade hot terms — deliberately, to exercise the
sharded/salted posting shuffle under skew.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

import ray.data

from .extract import html_of

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)
_BASE_EPOCH_S = 1704067200  # 2024-01-01T00:00:00Z (fixed, timezone-independent)

_CORE = (
    "the of and to a in is was for on as with by at from it an be this are "
    "or his that he which had not have has but were she they data query "
    "index search engine web page site news article user time year world "
    "system model result value table row column batch stream merge sort "
    "join filter group order window hash scan part vector text token term "
    "score rank document corpus shard block list cache store read write"
).split()
# FIXTURES.md F1: ~50k-term vocabulary — Lucene stopwords at natural
# (Zipf-head) frequency via _CORE, long generated tail.
_VOCAB_SIZE = 50_000
_VOCAB = np.asarray(
    _CORE + [f"w{i:05d}" for i in range(_VOCAB_SIZE - len(_CORE))], dtype=object
)
_VOCAB_PA = __import__("pyarrow").array(_VOCAB.tolist(), type=__import__("pyarrow").string())
# rare edge-case tokens (CJK / possessive / URL / emoji) appended to a
# small fraction of docs — they exercise the analyzer's UAX#29 slow path
# and the mixed-batch stitch (FIXTURES.md F1)
_EDGE_TOKENS = ["東京", "don't", "example.com", "👍", "naïve", "3.14"]
_EDGE_RATE = 0.005  # ~0.5% of docs
_LANGS = np.asarray(["en", "es", "de", "fr", "zh"], dtype=object)
# FIXTURES.md: en-dominant language mix
_LANG_WEIGHTS = np.asarray([0.95, 0.0125, 0.0125, 0.0125, 0.0125])
_LANG_CUM = np.cumsum(_LANG_WEIGHTS)
_PARA_TOKENS = 50  # paragraph break every ~50 tokens

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain algorithm)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    """hash → float64 uniform in (0, 1)."""
    return (_splitmix64(x).astype(np.float64) + 1.0) / 18446744073709551617.0


def _gen_batch(batch: pa.Table, seed: int) -> pa.Table:
    from ..runtime import ensure_worker_tuned

    ensure_worker_tuned()
    ids = batch["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    n = ids.size
    seed64 = np.uint64(seed)
    # doc length: 20 + exponential(mean 80), clipped at 800
    u_len = _uniform(ids * np.uint64(2654435761) + seed64)
    n_tokens = (20 + np.minimum(-80.0 * np.log(u_len), 800.0)).astype(np.int64)
    total = int(n_tokens.sum())
    doc_rep = np.repeat(np.arange(n, dtype=np.uint64), n_tokens)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tokens, out=offsets[1:])
    pos = np.arange(total, dtype=np.uint64) - offsets[:-1].astype(np.uint64)[doc_rep]
    # token stream: counter hash of (seed, doc_id, position)
    ctr = (ids[doc_rep] * np.uint64(0x100000001B3)) + pos + (seed64 << np.uint64(32))
    u_tok = _uniform(ctr)
    ranks = (
        np.minimum(np.power(u_tok, -1.0 / 0.3), float(len(_VOCAB))).astype(np.int64) - 1
    )
    # don't CLIP the Zipf tail onto the last word (that would make it a
    # fake hot term); resample overflow ranks uniformly over the upper
    # half of the vocabulary
    over = ranks >= len(_VOCAB) - 1
    if over.any():
        tail_lo = len(_VOCAB) // 2
        ranks[over] = tail_lo + (
            _splitmix64(ctr[over] + np.uint64(0xABCDEF)) % np.uint64(len(_VOCAB) - tail_lo)
        ).astype(np.int64)
    # all string assembly in Arrow C++ (no per-doc Python string ops);
    # vocab tokens and urls/html contain no [&<>"] so html escaping is the
    # identity — layout matches html_of() byte-for-byte (tested).
    import pyarrow.compute as pc

    from .extract import _MID, _POST, _PRE

    tok_arr = pc.take(_VOCAB_PA, pa.array(ranks, type=pa.int64()))
    # paragraph structure (FIXTURES.md F1): two-level C++ join — tokens →
    # " "-joined paragraphs of _PARA_TOKENS, paragraphs → "\n\n"-joined doc
    paras_per_doc = (n_tokens + _PARA_TOKENS - 1) // _PARA_TOKENS
    # segmented arange (no per-doc allocations): paragraph p of doc i
    # starts at offsets[i] + 50*p
    total_paras = int(paras_per_doc.sum())
    para_doc = np.repeat(np.arange(n, dtype=np.int64), paras_per_doc)
    para_within = np.arange(total_paras, dtype=np.int64) - np.repeat(
        np.cumsum(paras_per_doc) - paras_per_doc, paras_per_doc
    )
    para_tok_offsets = np.concatenate(
        (offsets[para_doc] + _PARA_TOKENS * para_within, offsets[-1:])
    )
    paras = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(para_tok_offsets), tok_arr), " "
    )
    doc_para_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(paras_per_doc, out=doc_para_offsets[1:])
    texts = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(doc_para_offsets), paras), "\n\n"
    )
    # rare edge tokens appended to ~0.5% of docs (deterministic per doc)
    u_edge = _uniform(ids * np.uint64(0x9E3779B1) + np.uint64(7919))
    edge_mask = u_edge < _EDGE_RATE
    if edge_mask.any():
        which = (_splitmix64(ids + np.uint64(104729)) % np.uint64(len(_EDGE_TOKENS))).astype(np.int64)
        suffix = np.where(
            edge_mask, np.asarray([" " + t for t in _EDGE_TOKENS], dtype=object)[which], ""
        )
        texts = pc.binary_join_element_wise(texts, pa.array(suffix, type=pa.string()), "")
    ids_i = ids.astype(np.int64)
    id_str = pc.cast(pa.array(ids_i), pa.string())
    site_str = pc.cast(pa.array(ids_i % 1000), pa.string())
    urls = pc.binary_join_element_wise(
        "https://site", site_str, ".example.com/p/", id_str, ""
    )
    # (last argument of binary_join_element_wise is the separator)
    htmls = pc.cast(
        pc.binary_join_element_wise(_PRE, urls, _MID, texts, _POST, ""), pa.binary()
    )
    ts = (ids_i + _BASE_EPOCH_S) * 1_000_000  # warc_ts = 2024-01-01 UTC + doc_id sec
    u_lang = _uniform(ids * np.uint64(0x85EBCA6B) + np.uint64(13))
    langs = _LANGS[np.searchsorted(_LANG_CUM, u_lang)]
    return pa.table(
        {
            "doc_id": pa.array(ids_i, type=pa.int64()),
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": htmls,
            "text": texts,
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def generate_pages(n: int, seed: int = 42, parallelism: int = -1) -> "ray.data.Dataset":
    """Dataset of n synthetic pages (streamed, never materialized)."""
    return ray.data.range(
        n, override_num_blocks=parallelism if parallelism > 0 else None
    ).map_batches(lambda b: _gen_batch(b, seed), batch_format="pyarrow", batch_size=None)


def make_pages_from_documents(docs: pa.Table) -> pa.Table:
    """Wrap an existing (doc_id, text, lang) documents table into the
    north-rule page shape (deterministic html/url/warc_ts per doc_id)."""
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist() if "lang" in docs.column_names else ["en"] * len(ids)
    urls = [f"https://site{i % 1000}.example.com/p/{i}" for i in ids]
    tss = [_BASE_TS + _dt.timedelta(seconds=int(i)) for i in ids]
    htmls = [html_of(u, t) for u, t in zip(urls, texts)]
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
