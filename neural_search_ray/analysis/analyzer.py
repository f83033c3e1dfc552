"""Lucene-compatible standard analyzer: UAX#29-style word-break tokenizer
+ LowerCaseFilter + optional StopFilter (Lucene English stop set).

This is the core text operator of the engine (SURVEY.md §2.8). The
reference consumes Lucene's StandardAnalyzer via the OpenSearch
AnalysisRegistry (processor/chunker/FixedTokenLengthChunker.java:158-168,
query/NeuralSparseQueryBuilder.java:519-543); we re-specify the semantics
here and the same module is used by BOTH the engine and the test oracle,
so engine/oracle token parity is by construction (SURVEY.md §7.4).

Tokenizer specification (documented approximation of UAX#29 word break as
implemented by Lucene's StandardTokenizer):

- A token is a maximal run of Unicode letters/digits (``[^\\W_]`` i.e.
  \\w minus underscore), where a single *mid* character from ``' ’ .``
  may join two alphanumeric runs (so ``don't``, ``example.com``,
  ``3.14`` are single tokens), and a single *mid-number* ``,`` may join
  two DIGIT runs only (``1,024`` joins; ``a,b`` splits). ``:`` never
  joins (UAX#29 removed it from MidLetter).
- Hyphens, underscores, and all other punctuation split tokens
  (``e-mail`` → ``e``, ``mail`` — matches Lucene StandardTokenizer).
- Tokens longer than ``max_token_length`` (Lucene default 255) are split
  into max-length pieces.
- LowerCaseFilter: str.lower().
- StopFilter: Lucene's 33-word English stop set, applied AFTER lowercasing.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import AnalyzerConfig
from .stem import apply_token_filters

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
ENGLISH_STOPWORDS = frozenset(
    [
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with",
    ]
)

# alnum run, optionally joined by single mid chars between runs:
# ' ’ . join any alnum runs (UAX#29 MidNumLet / Lucene StandardTokenizer
# — don't, example.com, 3.14); ',' joins DIGIT runs only (MidNum —
# 1,024 but NOT a,b); ':' is not a joiner (removed from MidLetter).
_WORD_SRC = r"[^\W_]+(?:(?:['’.]|(?<=\d),(?=\d))[^\W_]+)*"
_WORD_RE = re.compile(_WORD_SRC, re.UNICODE)
# trailing/leading joiners never match because the joiner must sit between runs.

# uax_url_email = standard + URLs (scheme://...) and e-mails kept as
# single tokens (Lucene UAX29URLEmailTokenizer; approximation documented
# — bare hostnames without a scheme tokenize like standard).
_URL_SRC = r"[A-Za-z][A-Za-z0-9+.-]*://[^\s<>\"']+"
_EMAIL_SRC = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~.-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+"

# classic (Lucene ClassicTokenizer, documented approximation): e-mails,
# dotted hosts/acronyms/numbers (example.com, U.S.A, 3.14), hyphenated
# tokens kept whole only when a segment contains a digit (X-25), words
# with interior apostrophes; everything else splits.
_CLASSIC_SRC = "|".join([
    _EMAIL_SRC,
    r"[A-Za-z0-9]+(?:\.[A-Za-z0-9]+)+",
    r"[^\W_]+(?:-[^\W_]*\d[^\W_]*)+",
    r"[^\W_]+(?:['’][^\W_]+)*",
])

# thai: Thai runs are found by script block, then dictionary-segmented by
# greedy maximal matching (analysis/thai.py) — the reference gets this from
# Lucene's ThaiTokenizer / ICU BreakIterator; the mechanism here is real,
# the embedded lexicon is a starter set (extensible at runtime). Non-Thai
# text tokenizes like standard.
_THAI_BLOCK = "฀-๿"
_THAI_SRC = (
    f"[{_THAI_BLOCK}]+|"
    + _WORD_SRC.replace(r"[^\W_]", f"[^\\W_{_THAI_BLOCK}]")
)

# tokenizer variants (the reference chunker whitelist,
# processor/chunker/FixedTokenLengthChunker.java:56-64):
_TOKENIZER_RES = {
    "standard": _WORD_RE,
    "whitespace": re.compile(r"\S+"),
    "letter": re.compile(r"[^\W\d_]+", re.UNICODE),
    # LowerCaseTokenizer = LetterTokenizer boundaries + lowercase; the
    # lowercase step is the analyzer's own filter, so boundaries = letter
    "lowercase": re.compile(r"[^\W\d_]+", re.UNICODE),
    "uax_url_email": re.compile(f"{_URL_SRC}|{_EMAIL_SRC}|{_WORD_SRC}", re.UNICODE),
    "classic": re.compile(_CLASSIC_SRC, re.UNICODE),
    "thai": re.compile(_THAI_SRC, re.UNICODE),
}


@lru_cache(maxsize=8)
def _stop_tuple(remove: bool) -> frozenset[str]:
    return ENGLISH_STOPWORDS if remove else frozenset()


def tokenize(text: str, config: AnalyzerConfig = AnalyzerConfig()) -> list[str]:
    """Analyze one string → list of tokens. Pure function of (text, config)."""
    if not text:
        return []
    raw = _TOKENIZER_RES[config.tokenizer].findall(text)
    if config.tokenizer == "thai":
        from .thai import DEFAULT_SEGMENTER, _THAI_RUN_RE

        raw = [
            seg
            for tok in raw
            for seg in (
                DEFAULT_SEGMENTER.segment(tok) if _THAI_RUN_RE.match(tok) else (tok,)
            )
        ]
    mtl = config.max_token_length
    out: list[str] = []
    stops = _stop_tuple(config.remove_stopwords)
    lower = config.lowercase
    poss, stemmer = config.strip_possessive, config.stemmer
    fold = getattr(config, "fold_ascii", False)
    filt = poss or fold or stemmer != "none"
    for tok in raw:
        if lower:
            tok = tok.lower()
        if len(tok) > mtl:
            # Lucene splits over-long tokens into max-length pieces
            for i in range(0, len(tok), mtl):
                piece = tok[i : i + mtl]
                if piece not in stops:
                    if filt:
                        piece = apply_token_filters(piece, poss, stemmer, fold)
                        if not piece:
                            continue
                    out.append(piece)
        elif tok not in stops:
            if filt:
                tok = apply_token_filters(tok, poss, stemmer, fold)
                if not tok:
                    continue
            out.append(tok)
    if getattr(config, "cjk_bigram", False):
        from .cjk import expand_cjk_bigrams_tokens

        out = expand_cjk_bigrams_tokens(out)
    return out


# Batch/vectorized form ------------------------------------------------------

def analyze(texts, config: AnalyzerConfig = AnalyzerConfig()) -> list[list[str]]:
    """Analyze a sequence of strings → list of token lists."""
    return [tokenize(t if t is not None else "", config) for t in texts]


_SIMPLE_RE = r"^[A-Za-z0-9 \n]*$"  # texts where the analyzer == lower + whitespace-split


def _analyze_column_slow(col: pa.Array, config: AnalyzerConfig) -> pa.ListArray:
    texts = col.to_pylist()
    token_lists = analyze(texts, config)
    offsets = np.zeros(len(token_lists) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in token_lists], out=offsets[1:])
    flat = [tok for toks in token_lists for tok in toks]
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()), pa.array(flat, type=pa.string())
    )


def _strip_empty_tokens(lists: pa.ListArray) -> pa.ListArray:
    """Drop zero-length tokens from a list<string> (vectorized)."""
    flat = lists.flatten()
    keep = pc.greater(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    if keep_np.all():
        return lists
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    kept_before = np.concatenate(([0], np.cumsum(keep_np)))
    new_offsets = kept_before[offsets - offsets[0]]
    return pa.ListArray.from_arrays(
        pa.array(new_offsets, type=pa.int64()), flat.filter(keep)
    )


def analyze_column(
    col: pa.ChunkedArray | pa.Array,
    config: AnalyzerConfig = AnalyzerConfig(),
) -> pa.ListArray:
    """Analyze an Arrow string column → Arrow list<string> column.

    Fast path (the hot path at corpus scale): when every row matches
    ``[A-Za-z0-9 ]*`` — ASCII alphanumerics and spaces only — the
    standard analyzer reduces EXACTLY to lowercase + space-split (no
    joiner or over-long-token rules can trigger), so the whole batch is
    processed with Arrow C++ kernels (utf8_lower, split_pattern) with no
    per-token Python objects. Rows failing the precondition fall back to
    the reference Python tokenizer; results are stitched back in row
    order. Fast path requires lowercase=True, no stopword removal, and
    max_token_length >= 32 (spaceless runs longer than that are rare; the
    precondition can't see token lengths cheaply, so runs > mtl force the
    slow path via the regex below).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if getattr(config, "cjk_bigram", False):
        # bigram expansion is a LIST-shape transform (token counts
        # change), so it wraps the whole chain: analyze without it,
        # then expand — regex-gated, non-CJK batches return unchanged
        from dataclasses import replace as _dc_replace

        from .cjk import expand_cjk_bigrams_lists

        base = _dc_replace(config, cjk_bigram=False)
        return expand_cjk_bigrams_lists(analyze_column(col, base))
    if (
        config.strip_possessive
        or config.stemmer != "none"
        or config.fold_ascii
    ):
        # run the base analysis without the token filters (stopwords are
        # judged on unstemmed tokens — Lucene chain order), then apply
        # the filters VECTORIZED over the flat token array: one
        # ends_with/replace_slice kernel chain per rule, both for the
        # fast path and the stitched slow path.
        from dataclasses import replace as _dc_replace

        from .stem import apply_token_filters_flat

        base = _dc_replace(
            config, strip_possessive=False, stemmer="none", fold_ascii=False
        )
        lists = analyze_column(col, base)
        flat = apply_token_filters_flat(
            lists.flatten(), config.strip_possessive, config.stemmer,
            config.fold_ascii,
        )
        return _strip_empty_tokens(
            pa.ListArray.from_arrays(lists.offsets, flat)
        )
    fast_eligible = (
        config.lowercase
        and not config.remove_stopwords
        and config.max_token_length >= 32
        and config.tokenizer in ("standard", "whitespace")
    )
    if not fast_eligible:
        return _analyze_column_slow(col, config)
    simple = pc.match_substring_regex(col, _SIMPLE_RE)
    simple_np = pc.fill_null(simple, False).to_numpy(zero_copy_only=False)
    # guard max_token_length: any run of 32+ alnum chars goes slow-path
    if simple_np.any():
        long_run = pc.match_substring_regex(col, "[A-Za-z0-9]{%d}" % (config.max_token_length + 1))
        simple_np &= ~pc.fill_null(long_run, False).to_numpy(zero_copy_only=False)
    if not simple_np.any():
        return _analyze_column_slow(col, config)
    lowered = pc.utf8_lower(col)
    # newlines are plain separators for the analyzer: fold them to spaces
    lowered = pc.replace_substring(lowered, "\n", " ")
    fast_lists = _strip_empty_tokens(pc.split_pattern(lowered, " "))
    if simple_np.all():
        return fast_lists
    # stitch (vectorized): python-tokenize only the non-simple rows, then
    # merge by gathering from the concatenated flat token arrays — no
    # per-row Python list boxing of the fast rows.
    slow_idx = np.flatnonzero(~simple_np)
    slow_lists = _analyze_column_slow(col.take(pa.array(slow_idx)), config)
    fa = fast_lists.flatten()
    foA = fast_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    foA = foA - foA[0]
    fb = slow_lists.flatten()
    foB = slow_lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(col)
    seg_start = np.empty(n, dtype=np.int64)
    seg_len = np.empty(n, dtype=np.int64)
    simple_rows = np.flatnonzero(simple_np)
    seg_start[simple_rows] = foA[simple_rows]
    seg_len[simple_rows] = foA[simple_rows + 1] - foA[simple_rows]
    seg_start[slow_idx] = len(fa) + foB[:-1]
    seg_len[slow_idx] = np.diff(foB)
    total = int(seg_len.sum())
    gather = np.repeat(seg_start, seg_len) + (
        np.arange(total) - np.repeat(np.cumsum(seg_len) - seg_len, seg_len)
    )
    combined = pa.concat_arrays([fa, fb.cast(pa.string())])
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(seg_len, out=out_offsets[1:])
    return pa.ListArray.from_arrays(
        pa.array(out_offsets, type=pa.int64()),
        combined.take(pa.array(gather)),
    )


def term_frequencies(tokens: list[str]) -> dict[str, int]:
    """token list → {term: tf}. Sparse-encoding analogue of the reference's
    analyzer-based token→weight map (util/TokenWeightUtil.java:42-57)."""
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    return tf
