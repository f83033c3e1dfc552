"""Deterministic synthetic Common-Crawl-style page corpus.

Produces the north-rule input table (BASELINE.json input_hint):
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. Content is a pure function of (seed, doc_id) — batch and
partition boundaries do NOT affect output, so any run at any parallelism
generates byte-identical pages (required for resumable builds with
deterministic docIDs, SURVEY.md §7.4).

The vocabulary has a Zipf-like skew including stopword-grade hot terms —
deliberately, to exercise the salted/sharded posting shuffle.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

import ray.data

from .extract import html_of

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)

# ~1000-word vocabulary: common core + generated tail
_CORE = (
    "the of and to a in is was for on as with by at from it an be this are "
    "or his that he which had not have has but were she they data query "
    "index search engine web page site news article user time year world "
    "system model result value table row column batch stream merge sort "
    "join filter group order window hash scan part vector text token term "
    "score rank document corpus shard block list cache store read write"
).split()
_VOCAB = _CORE + [f"w{i:04d}" for i in range(1000 - len(_CORE))]
_LANGS = ["en", "es", "de", "fr", "zh"]


def _page_row(seed: int, doc_id: int) -> tuple[str, _dt.datetime, bytes, str, str]:
    rng = np.random.default_rng([seed, doc_id])
    n_tokens = int(20 + min(rng.exponential(80.0), 800))
    # Zipf-ish ranks over the vocab → heavy skew on low ranks
    ranks = np.minimum(
        rng.zipf(1.3, size=n_tokens) - 1, len(_VOCAB) - 1
    )
    text = " ".join(_VOCAB[r] for r in ranks)
    url = f"https://site{doc_id % 1000}.example.com/p/{doc_id}"
    ts = _BASE_TS + _dt.timedelta(seconds=int(doc_id))
    lang = _LANGS[doc_id % len(_LANGS)]
    return url, ts, html_of(url, text), text, lang


def _gen_batch(batch: pa.Table, seed: int) -> pa.Table:
    ids = batch["id"].to_pylist()
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i in ids:
        u, t, h, x, l = _page_row(seed, i)
        urls.append(u)
        tss.append(t)
        htmls.append(h)
        texts.append(x)
        langs.append(l)
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


def generate_pages(n: int, seed: int = 42, parallelism: int = -1) -> "ray.data.Dataset":
    """Dataset of n synthetic pages (streamed, never materialized)."""
    return ray.data.range(n, override_num_blocks=parallelism if parallelism > 0 else None).map_batches(
        lambda b: _gen_batch(b, seed), batch_format="pyarrow"
    )


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
