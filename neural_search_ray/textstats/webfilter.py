"""Web-scale training-data filters over the documents corpus.

Semantics specified fresh from the published heuristics (code original):

- Repetition signals: Gopher's repetitious-text rules (Rae et al. 2021,
  arXiv:2112.11446, Table A1) — duplicate-word fraction, top-bigram
  character fraction, duplicated-trigram character fraction.
- Heuristic cleaning verdicts: C4-style document filters (Raffel et
  al. 2020, arXiv:1910.10683 §2.2) — minimum word count, mean word
  length band, stopword-density floor.
- Cross-document window dedup: exact duplicated-span detection in the
  spirit of Lee et al. 2021 (arXiv:2107.06499) restated as a
  hash-partition groupby (window -> distinct-doc test) instead of a
  suffix array, so it shuffles only (window_hash, doc_id, count) rows.
- Benchmark decontamination: n-gram membership against a small
  broadcast contamination set (Brown et al. 2020, arXiv:2005.14165 §C).

All kernels are batch-vectorized: one ``analyze_column`` pass per
batch, window construction by flat token gather + ``LargeListArray`` +
``pc.binary_join`` (Arrow C++), counts via ``np.unique`` over paired
(doc, code) keys. No per-row Python in any hot stage.

Scale notes (100 TB): every stage here is a pure ``map_batches`` map
except window dedup, whose single all-to-all exchange is keyed by a
63-bit window hash (uniformly distributed — no hot key) and moves one
(hash, doc, count) row per distinct window per doc per block thanks to
the in-batch combiner. Real deployments use wider windows (e.g. 50
tokens, the Lee et al. setting); the width is a parameter and the
synthetic corpus's tiny vocabulary is why the suite entry pins width 3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.analyzer import ENGLISH_STOPWORDS, analyze_column
from ..config import AnalyzerConfig

# ---------------------------------------------------------------------------
# thresholds (module constants so the SQL oracles quote the same values)

C4_MIN_WORDS = 35
C4_MEAN_LEN_LO = 3.9
C4_MEAN_LEN_HI = 10.0
C4_MIN_STOP_RATIO = 0.05

SAMPLE_BUCKET_EDGES = (0.03, 0.12)  # on stopword_ratio (rounded to 6)
SAMPLE_RATE_PER_MILLE = (200, 600, 900)  # keep rate by bucket
SAMPLE_SALT = ":qs"

CONTAMINATION_PHRASES = (
    "big order scan",
    "slow hash batch",
    "data merge group",
    "window fast query",
    "the fast join",
    "table table key",
)

DEDUP_WINDOW_WIDTH = 3

_MASK63 = (1 << 63) - 1


# ---------------------------------------------------------------------------
# shared vectorized helpers


def _token_arrays(
    batch: pa.Table, text_column: str = "text"
) -> tuple[pa.Array, np.ndarray]:
    """One analyzer pass: (flat token StringArray, per-doc token counts)."""
    col = batch[text_column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tok_lists = analyze_column(col, AnalyzerConfig())
    offs = tok_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    flat = tok_lists.flatten()
    return flat, lens


def window_strings(
    flat: pa.Array, lens: np.ndarray, width: int, stride: int
) -> tuple[np.ndarray, pa.Array]:
    """Vectorized token-window construction.

    For doc d with L tokens, windows start at local offsets 0, stride,
    2*stride, ... while start+width <= L. Returns (win_doc_idx into the
    batch rows, space-joined window strings). Entirely Arrow/numpy:
    gather indices built with repeat/arange, strings joined with the
    Arrow C++ ``binary_join`` kernel.
    """
    n_wins = np.maximum(0, (lens - width) // stride + 1).astype(np.int64)
    total = int(n_wins.sum())
    if total == 0:
        return np.empty(0, np.int64), pa.array([], type=pa.string())
    win_doc_idx = np.repeat(np.arange(lens.size, dtype=np.int64), n_wins)
    doc_base = np.concatenate(([0], np.cumsum(lens)))[:-1]
    first_win = np.concatenate(([0], np.cumsum(n_wins)))[:-1]
    local = (np.arange(total, dtype=np.int64) - first_win[win_doc_idx]) * stride
    win_start = doc_base[win_doc_idx] + local
    gather = (win_start[:, None] + np.arange(width, dtype=np.int64)[None, :]).ravel()
    toks = flat.take(pa.array(gather))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = pa.array(np.arange(total + 1, dtype=np.int64) * width, type=pa.int64())
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, toks.cast(pa.large_string())),
        pa.scalar(" ", type=pa.large_string()),
    )
    return win_doc_idx, joined.cast(pa.string())


def _doc_window_counts(
    win_doc_idx: np.ndarray, win_str: pa.Array, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """(doc, window) multiplicities via dictionary-encode + paired-key
    np.unique — same shape as stages/tfvec.doc_term_tf."""
    if not len(win_str):
        e = np.empty(0, np.int64)
        return e, e, e, pa.array([], type=pa.string())
    denc = win_str.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniques = denc.dictionary.cast(pa.string())
    n_uniq = len(uniques)
    pair = win_doc_idx * n_uniq + codes
    upair, cnt = np.unique(pair, return_counts=True)
    return upair // n_uniq, upair % n_uniq, cnt.astype(np.int64), uniques


def _round6(x: np.ndarray) -> np.ndarray:
    from ..pipelines.suite import round_half_up

    return round_half_up(x, 6)


# ---------------------------------------------------------------------------
# Gopher repetition signals


def repetition_stats_stage(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text"
) -> pa.Table:
    """Per-doc repetition signals (Rae et al. 2021 Table A1 analogues):

    - dup_word_frac: (n_tokens - n_unique) / n_tokens
    - top_bigram_char_frac: chars of the most frequent bigram (count *
      word-chars, ties -> lexicographically smallest bigram) / total
      word chars
    - dup_trigram_char_frac: sum over trigrams occurring >= 2 times of
      count * word-chars / total word chars (documented approximation
      of Gopher's position-coverage definition; overlaps counted per
      occurrence)
    """
    n = batch.num_rows
    flat, lens = _token_arrays(batch, text_column)
    n_tokens = lens
    # unique tokens + total word chars per doc
    from ..stages.tfvec import doc_term_tf

    doc_idx, codes, tf, uniques = doc_term_tf(
        batch, id_column=id_column, text_column=text_column
    )
    n_unique = np.bincount(doc_idx, minlength=n).astype(np.int64) if n else np.zeros(0, np.int64)
    denom = np.zeros(n, dtype=np.int64)
    if codes.size:
        uniq_len = pc.utf8_length(uniques).cast(pa.int64()).to_numpy(zero_copy_only=False)
        np.add.at(denom, doc_idx, tf * uniq_len[codes])

    def _char_fracs() -> tuple[np.ndarray, np.ndarray]:
        top_frac = np.zeros(n, dtype=np.float64)
        dup3_frac = np.zeros(n, dtype=np.float64)
        # bigrams, stride 1
        wdoc2, wstr2 = window_strings(flat, lens, width=2, stride=1)
        d2, c2, cnt2, u2 = _doc_window_counts(wdoc2, wstr2, n)
        if cnt2.size:
            u2_np = np.asarray(u2.to_pylist(), dtype=object)
            order = np.argsort(u2_np, kind="stable")
            str_rank = np.empty(len(u2_np), dtype=np.int64)
            str_rank[order] = np.arange(len(u2_np))
            sel = np.lexsort((str_rank[c2], -cnt2, d2))
            first = sel[np.concatenate(([True], np.diff(d2[sel]) != 0))]
            chars2 = pc.utf8_length(u2).cast(pa.int64()).to_numpy(zero_copy_only=False) - 1
            docs_t = d2[first]
            with np.errstate(divide="ignore", invalid="ignore"):
                top_frac[docs_t] = np.where(
                    denom[docs_t] > 0,
                    cnt2[first] * chars2[c2[first]] / np.maximum(denom[docs_t], 1),
                    0.0,
                )
        # trigrams, stride 1
        wdoc3, wstr3 = window_strings(flat, lens, width=3, stride=1)
        d3, c3, cnt3, u3 = _doc_window_counts(wdoc3, wstr3, n)
        if cnt3.size:
            chars3 = pc.utf8_length(u3).cast(pa.int64()).to_numpy(zero_copy_only=False) - 2
            dup = cnt3 >= 2
            dup_chars = np.zeros(n, dtype=np.int64)
            np.add.at(dup_chars, d3[dup], cnt3[dup] * chars3[c3[dup]])
            with np.errstate(divide="ignore", invalid="ignore"):
                dup3_frac = np.where(denom > 0, dup_chars / np.maximum(denom, 1), 0.0)
        return top_frac, dup3_frac

    top_frac, dup3_frac = _char_fracs()
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_word = np.where(
            n_tokens > 0, (n_tokens - n_unique) / np.maximum(n_tokens, 1), 0.0
        )
    ids = batch[id_column]
    return pa.table(
        {
            id_column: ids,
            "n_tokens": pa.array(n_tokens),
            "dup_word_frac": pa.array(_round6(dup_word)),
            "top_bigram_char_frac": pa.array(_round6(top_frac)),
            "dup_trigram_char_frac": pa.array(_round6(dup3_frac)),
        }
    )


# ---------------------------------------------------------------------------
# C4-style filter verdicts


def c4_filter_stage(
    batch: pa.Table, id_column: str = "doc_id", text_column: str = "text"
) -> pa.Table:
    """Per-doc boolean verdicts (emitted as int64 0/1 for oracle-stable
    hashing): too-short, mean-word-length out of band, stopword density
    below floor; keep = no flag set. Thresholds are module constants
    quoted verbatim in the SQL oracle."""
    from ..stages.tfvec import doc_term_tf

    n = batch.num_rows
    doc_idx, codes, tf, uniques = doc_term_tf(
        batch, id_column=id_column, text_column=text_column
    )
    n_tokens = np.zeros(n, dtype=np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    sum_len = np.zeros(n, dtype=np.int64)
    if codes.size:
        np.add.at(n_tokens, doc_idx, tf)
        uniq_len = pc.utf8_length(uniques).cast(pa.int64()).to_numpy(zero_copy_only=False)
        np.add.at(sum_len, doc_idx, tf * uniq_len[codes])
        uniq_stop = np.fromiter(
            (u in ENGLISH_STOPWORDS for u in uniques.to_pylist()),
            dtype=bool, count=len(uniques),
        )
        mask = uniq_stop[codes]
        np.add.at(n_stop, doc_idx[mask], tf[mask])
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_len = np.where(n_tokens > 0, sum_len / np.maximum(n_tokens, 1), 0.0)
        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
    f_short = (n_tokens < C4_MIN_WORDS).astype(np.int64)
    f_len = ((mean_len < C4_MEAN_LEN_LO) | (mean_len > C4_MEAN_LEN_HI)).astype(np.int64)
    f_stop = (stop_ratio < C4_MIN_STOP_RATIO).astype(np.int64)
    keep = ((f_short | f_len | f_stop) == 0).astype(np.int64)
    return pa.table(
        {
            id_column: batch[id_column],
            "flag_too_short": pa.array(f_short),
            "flag_mean_len": pa.array(f_len),
            "flag_low_stop": pa.array(f_stop),
            "keep": pa.array(keep),
        }
    )


# ---------------------------------------------------------------------------
# cross-document window dedup


DEDUP_HASH_BUCKETS = 256  # salt buckets for the whash exchange


def window_hash_rows_stage(
    width: int = DEDUP_WINDOW_WIDTH, num_buckets: int = DEDUP_HASH_BUCKETS
):
    """map_batches fn: (doc_id, text) -> (wbucket, whash, doc_id, cnt)
    rows — the per-batch combiner before the single groupby(wbucket)
    exchange. whash is the 63-bit md5_number_lower of the window string,
    so the SQL oracle groups by the identical key (collision semantics
    match exactly on both sides). wbucket = whash % num_buckets bounds
    the downstream group COUNT (a Python call per bucket, not per
    distinct window hash) while keeping co-location of equal hashes."""
    from ..dedup.common import h64_batch

    def fn(batch: pa.Table) -> pa.Table:
        flat, lens = _token_arrays(batch)
        wdoc, wstr = window_strings(flat, lens, width=width, stride=width)
        d, c, cnt, uniques = _doc_window_counts(wdoc, wstr, batch.num_rows)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uh = (
            h64_batch(uniques.to_pylist()).astype(np.uint64) & _MASK63
        ).astype(np.int64) if len(uniques) else np.empty(0, np.int64)
        wh = uh[c] if c.size else c
        return pa.table(
            {
                "wbucket": pa.array(wh % num_buckets),
                "whash": pa.array(wh),
                "doc_id": pa.array(doc_ids[d] if d.size else d),
                "cnt": pa.array(cnt),
            }
        )

    return fn


def window_dup_bucket_group(g: pa.Table) -> pa.Table:
    """map_groups over wbucket (a SALT bucket holding many whash
    groups): vectorized over every window hash in the bucket at once —
    combine per-(whash, doc) counts across input blocks, mark a window
    duplicated when it spans >= 2 distinct docs, emit per-doc partial
    (n_windows, n_dup_windows) sums for the final doc-keyed aggregate.
    Segmented numpy throughout; one Python call per bucket."""
    wh = g["whash"].to_numpy(zero_copy_only=False).astype(np.int64)
    docs = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    if wh.size == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_windows": pa.array([], pa.int64()),
                "n_dup_windows": pa.array([], pa.int64()),
            }
        )
    order = np.lexsort((docs, wh))
    wh, docs, cnt = wh[order], docs[order], cnt[order]
    # combine duplicate (whash, doc) pairs arriving from different blocks
    pair_new = np.empty(wh.size, dtype=bool)
    pair_new[0] = True
    pair_new[1:] = (wh[1:] != wh[:-1]) | (docs[1:] != docs[:-1])
    pidx = np.cumsum(pair_new) - 1
    p_cnt = np.bincount(pidx, weights=cnt).astype(np.int64)
    p_wh = wh[pair_new]
    p_doc = docs[pair_new]
    # distinct-doc count per whash over the combined pairs
    w_new = np.empty(p_wh.size, dtype=bool)
    w_new[0] = True
    w_new[1:] = p_wh[1:] != p_wh[:-1]
    widx = np.cumsum(w_new) - 1
    ndocs = np.bincount(widx)
    dup = (ndocs[widx] > 1).astype(np.int64)
    # per-doc partials within this bucket
    ud, dinv = np.unique(p_doc, return_inverse=True)
    n_windows = np.bincount(dinv, weights=p_cnt).astype(np.int64)
    n_dup = np.bincount(dinv, weights=p_cnt * dup).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ud),
            "n_windows": pa.array(n_windows),
            "n_dup_windows": pa.array(n_dup),
        }
    )


# ---------------------------------------------------------------------------
# benchmark decontamination


def decontaminate_stage(
    batch: pa.Table,
    phrases: tuple[str, ...] = CONTAMINATION_PHRASES,
    width: int = 3,
) -> pa.Table:
    """Count stride-1 token-window hits against the (broadcast-small)
    contamination phrase set. Pure map — the phrase set rides the
    closure (ray.put-backed when large)."""
    n = batch.num_rows
    flat, lens = _token_arrays(batch)
    wdoc, wstr = window_strings(flat, lens, width=width, stride=1)
    n_hits = np.zeros(n, dtype=np.int64)
    if len(wstr):
        denc = wstr.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        hit_codes = np.isin(uniq, np.asarray(phrases, dtype=object))
        mask = hit_codes[codes]
        np.add.at(n_hits, wdoc[mask], 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_hits": pa.array(n_hits),
            "contaminated": pa.array((n_hits > 0).astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# deterministic quality-stratified sampling


def quality_sample_stage(batch: pa.Table) -> pa.Table:
    """Input: quality_stats rows (doc_id, stopword_ratio). Bucket by
    stopword density, keep iff h63(doc_id || salt) % 1000 < the
    bucket's keep rate — deterministic, shuffle-free downsampling (the
    standard web-corpus mixing primitive)."""
    from ..dedup.common import h64_batch

    ratio = batch["stopword_ratio"].to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bucket = np.digitize(ratio, SAMPLE_BUCKET_EDGES).astype(np.int64)
    rates = np.asarray(SAMPLE_RATE_PER_MILLE, dtype=np.int64)
    h = (
        h64_batch([f"{d}{SAMPLE_SALT}" for d in doc_ids]).astype(np.uint64) & _MASK63
    ).astype(np.int64)
    keep = (h % 1000) < rates[bucket]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[keep]),
            "bucket": pa.array(bucket[keep]),
        }
    )


# ---------------------------------------------------------------------------
# cross-doc window dedup APPLY (flag -> rebuild)

_TAIL_WIDX = 1 << 40  # sentinel ordinal: the partial-tail pseudo-window


def window_apply_rows_stage(
    width: int = DEDUP_WINDOW_WIDTH, num_buckets: int = DEDUP_HASH_BUCKETS
):
    """map_batches fn for the APPLY pipeline: (doc_id, text) ->
    (wbucket, whash, doc_id, widx, wtext) rows — every non-overlapping
    width-token window WITH its ordinal and text (the rebuild needs
    them), plus one tail row per doc carrying the trailing partial
    tokens under a per-doc negative whash (never duplicated, so the
    dedup pass always keeps it; it also guarantees every doc reaches
    the rebuild group, windows or not)."""
    from ..dedup.common import h64_batch

    def fn(batch: pa.Table) -> pa.Table:
        flat, lens = _token_arrays(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wdoc, wstr = window_strings(flat, lens, width=width, stride=width)
        n_wins = np.maximum(0, (lens - width) // width + 1).astype(np.int64)
        first_win = np.concatenate(([0], np.cumsum(n_wins)))[:-1]
        widx = np.arange(wdoc.size, dtype=np.int64) - first_win[wdoc]
        wh = (
            h64_batch(wstr.to_pylist()).astype(np.uint64) & _MASK63
        ).astype(np.int64) if len(wstr) else np.empty(0, np.int64)
        # tail strings: tokens past the last full window, one per doc
        doc_base = np.concatenate(([0], np.cumsum(lens)))[:-1]
        tail_start = doc_base + n_wins * width
        tail_len = lens - n_wins * width
        gather = np.repeat(tail_start, tail_len) + (
            np.arange(int(tail_len.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(tail_len) - tail_len, tail_len)
        )
        toks = flat.take(pa.array(gather))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.zeros(lens.size + 1, dtype=np.int64)
        np.cumsum(tail_len, out=offs[1:])
        tails = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(offs, pa.int64()), toks.cast(pa.large_string())
            ),
            pa.scalar(" ", type=pa.large_string()),
        ).cast(pa.string())
        tail_hash = -(doc_ids + 1)  # unique negative per doc
        return pa.table({
            "wbucket": pa.array(np.concatenate([
                wh % num_buckets, tail_hash % num_buckets
            ])),
            "whash": pa.array(np.concatenate([wh, tail_hash])),
            "doc_id": pa.array(np.concatenate([doc_ids[wdoc], doc_ids])),
            "widx": pa.array(np.concatenate([
                widx, np.full(lens.size, _TAIL_WIDX, np.int64)
            ])),
            "wtext": pa.concat_arrays([
                wstr.cast(pa.string()), tails
            ]),
        })

    return fn


def window_keep_bucket_group(g: pa.Table) -> pa.Table:
    """map_groups over wbucket: per whash, first-occurrence-wins across
    docs — the min doc_id keeps ALL its occurrences, every other doc
    drops the window (intra-doc repeats are NOT duplicates, matching
    window_dedup's distinct-doc rule). Segmented numpy, one Python call
    per salt bucket. Emits (doc_id, widx, wtext, keep)."""
    wh = g["whash"].to_numpy(zero_copy_only=False).astype(np.int64)
    docs = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((docs, wh))
    whs, dcs = wh[order], docs[order]
    starts = np.flatnonzero(np.concatenate(([True], whs[1:] != whs[:-1])))
    seg = np.zeros(whs.size, np.int64)
    seg[starts] = 1
    seg = np.cumsum(seg) - 1
    min_doc = dcs[starts][seg]           # per-row min doc of its whash
    keep_sorted = dcs == min_doc
    keep = np.empty(wh.size, bool)
    keep[order] = keep_sorted
    return pa.table({
        "doc_id": g["doc_id"],
        "widx": g["widx"],
        "wtext": g["wtext"],
        "keep": pa.array(keep),
    })


def window_rebuild_doc_group(g: pa.Table) -> pa.Table:
    """map_groups over doc_id: order windows by ordinal, join the kept
    ones (tail last via its sentinel ordinal), count kept/dropped FULL
    windows. One Python call per doc group, Arrow-joined strings."""
    widx = g["widx"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = g["keep"].to_numpy(zero_copy_only=False)
    order = np.argsort(widx, kind="stable")
    kept_rows = order[keep[order]]
    parts = g["wtext"].take(pa.array(kept_rows)).to_pylist()
    body = " ".join(p for p in parts if p != "")
    full = widx != _TAIL_WIDX
    return pa.table({
        "doc_id": g["doc_id"][:1],
        "new_text": pa.array([body], pa.string()),
        "n_kept": pa.array([int((keep & full).sum())], pa.int64()),
        "n_dropped": pa.array([int((~keep & full).sum())], pa.int64()),
    })
