"""Unit tests for textstats/webfilter.py and corpus/urlnorm.py —
scalar-reference parity for the vectorized kernels plus edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from neural_search_ray.corpus.urlnorm import canonicalize_urls
from neural_search_ray.textstats.webfilter import (
    C4_MIN_WORDS,
    c4_filter_stage,
    decontaminate_stage,
    quality_sample_stage,
    repetition_stats_stage,
    window_dup_bucket_group,
    window_hash_rows_stage,
    window_strings,
    _token_arrays,
)

DOCS = [
    "a b a b c",
    "x y z",
    "",
    "the quick fox the quick fox the quick fox",
    "solo",
]


def _table(texts=DOCS):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )


def naive_windows(texts, width, stride):
    out = []
    for d, t in enumerate(texts):
        toks = t.lower().split()
        i = 0
        while i + width <= len(toks):
            out.append((d, " ".join(toks[i : i + width])))
            i += stride
    return out


@pytest.mark.parametrize("width,stride", [(2, 1), (3, 1), (3, 3), (2, 2), (4, 2)])
def test_window_strings_matches_naive(width, stride):
    t = _table()
    flat, lens = _token_arrays(t)
    wd, ws = window_strings(flat, lens, width, stride)
    got = list(zip(wd.tolist(), ws.to_pylist()))
    assert got == naive_windows(DOCS, width, stride)


def test_window_strings_empty_batch():
    t = _table([""])
    flat, lens = _token_arrays(t)
    wd, ws = window_strings(flat, lens, 2, 1)
    assert len(wd) == 0 and len(ws) == 0


def test_repetition_stats_scalar_parity():
    t = _table()
    out = repetition_stats_stage(t).to_pydict()
    for i, text in enumerate(DOCS):
        toks = text.lower().split()
        n = len(toks)
        assert out["n_tokens"][i] == n
        dup_word = (n - len(set(toks))) / n if n else 0.0
        assert out["dup_word_frac"][i] == pytest.approx(dup_word, abs=1e-6)
        denom = sum(len(w) for w in toks)
        # top bigram: max count, tie -> lexicographically smallest
        bigrams = [" ".join(toks[j : j + 2]) for j in range(n - 1)]
        if bigrams and denom:
            from collections import Counter

            c = Counter(bigrams)
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            expect = top[1] * (len(top[0]) - 1) / denom
        else:
            expect = 0.0
        assert out["top_bigram_char_frac"][i] == pytest.approx(expect, abs=1e-6)
        trigrams = [" ".join(toks[j : j + 3]) for j in range(n - 2)]
        if trigrams and denom:
            from collections import Counter

            c = Counter(trigrams)
            dupch = sum(cnt * (len(g) - 2) for g, cnt in c.items() if cnt >= 2)
            expect3 = dupch / denom
        else:
            expect3 = 0.0
        assert out["dup_trigram_char_frac"][i] == pytest.approx(expect3, abs=1e-6)


def test_c4_filter_flags():
    long_doc = "the " + "word " * (C4_MIN_WORDS + 5)
    t = _table(["a b", long_doc])
    out = c4_filter_stage(t).to_pydict()
    assert out["flag_too_short"] == [1, 0]
    assert out["keep"][0] == 0
    # long doc: mean len ('the'*1 + 'word'*40)/41 ~ 3.97 >= 3.9, stop 1/41 < 0.05
    assert out["flag_low_stop"][1] == 1 and out["keep"][1] == 0


def test_window_dedup_group_semantics():
    rows = window_hash_rows_stage(2)(_table(["a b a b", "a b c d", "e f g h"]))
    # the bucket-group fn is vectorized over every whash it receives, so
    # applying it to the whole row table = applying it to one salt bucket
    # holding all hashes (also exercise split across two "blocks": dup
    # (whash, doc) rows must combine)
    import collections

    per_doc = collections.Counter()
    per_doc_dup = collections.Counter()
    out = window_dup_bucket_group(rows).to_pylist()
    for row in out:
        per_doc[row["doc_id"]] += row["n_windows"]
        per_doc_dup[row["doc_id"]] += row["n_dup_windows"]
    # doc0 windows: 'a b','a b' (cnt 2); doc1: 'a b','c d'; doc2: 'e f','g h'
    assert per_doc[0] == 2 and per_doc[1] == 2 and per_doc[2] == 2
    # 'a b' spans docs 0 and 1 -> dup; 'c d','e f','g h' unique
    assert per_doc_dup[0] == 2 and per_doc_dup[1] == 1 and per_doc_dup[2] == 0
    # duplicate (whash, doc) rows from different input blocks combine
    doubled = pa.concat_tables([rows, rows])
    out2 = {r["doc_id"]: r for r in window_dup_bucket_group(doubled).to_pylist()}
    assert out2[0]["n_windows"] == 4 and out2[2]["n_dup_windows"] == 0


def test_decontaminate_counts_overlapping():
    t = _table(["p q r p q r", "p q x"])
    out = decontaminate_stage(t, phrases=("p q r",), width=3).to_pydict()
    assert out["n_hits"] == [2, 0]
    assert out["contaminated"] == [1, 0]


def test_quality_sample_deterministic():
    from neural_search_ray.dedup.common import h64
    from neural_search_ray.textstats.webfilter import (
        SAMPLE_BUCKET_EDGES,
        SAMPLE_RATE_PER_MILLE,
        SAMPLE_SALT,
    )

    n = 200
    batch = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "stopword_ratio": pa.array(
                [(i % 20) / 100.0 for i in range(n)], pa.float64()
            ),
        }
    )
    out = quality_sample_stage(batch).to_pydict()
    kept = set(out["doc_id"])
    for i in range(n):
        ratio = (i % 20) / 100.0
        b = int(np.digitize(ratio, SAMPLE_BUCKET_EDGES))
        h = (h64(f"{i}{SAMPLE_SALT}") & ((1 << 63) - 1)) % 1000
        assert (i in kept) == (h < SAMPLE_RATE_PER_MILLE[b])
    # buckets reported for kept rows only, matching recomputation
    for d, b in zip(out["doc_id"], out["bucket"]):
        assert b == int(np.digitize((d % 20) / 100.0, SAMPLE_BUCKET_EDGES))


def test_canonicalize_urls_rules():
    out = canonicalize_urls(
        pa.array(
            [
                "HTTPS://WWW.Ex.COM:443/a?utm_x=1&b=2&a=1",
                "http://ex.com:80/",
                "http://ex.com:8080/",
                "https://sub.ex.com/p",
                "junk",
                "https://ex.com/?utm_only=1",
                None,
            ]
        )
    ).to_pydict()
    assert out["url_norm"] == [
        "https://ex.com/a?a=1&b=2",
        "http://ex.com/",
        "http://ex.com:8080/",
        "https://sub.ex.com/p",
        "",
        "https://ex.com/",
        "",
    ]
    assert out["host"][3] == "sub.ex.com"
    assert out["domain"][3] == "ex.com"
    assert out["domain"][4] == ""


def test_suite_entries_registered():
    from neural_search_ray.pipelines.suite import build_oracle_sql, build_queries

    qs, sqls = build_queries(), build_oracle_sql()
    for name in (
        "repetition_stats",
        "c4_filter",
        "window_dedup",
        "decontaminate",
        "quality_sample",
        "url_canonicalize",
    ):
        assert name in qs and name in sqls
