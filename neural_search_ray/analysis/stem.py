"""English token filters: possessive strip + minimal (plural) stemmer.

Lucene parity (the reference consumes these through the OpenSearch
AnalysisRegistry exactly like the standard analyzer,
processor/chunker/FixedTokenLengthChunker.java:158-168):

- ``strip_possessive`` = Lucene ``EnglishPossessiveFilter``: a token of
  length >= 2 ending in ``'s`` / ``’s`` / ``＇s`` loses the final two
  code points.
- ``stemmer="minimal_english"`` = Lucene ``EnglishMinimalStemmer``
  (Harman's S-stemmer, "How Effective Is Suffixing?" JASIS 42(1), 1991):
  only plural suffixes are touched —

      len < 3 or no trailing 's'        -> unchanged
      ends 'us' / 'ss'                  -> unchanged  (focus, caress)
      ends 'ies', len > 3, and the char
        before 'ies' is not 'a'/'e'     -> 'ies' -> 'y' (ponies -> pony)
      ends 'ies'/'aes'/'oes'/'ees'      -> unchanged  (goes, sees)
      otherwise                         -> drop final 's' (cats -> cat)

Both filters are offered as a pure-Python per-token form (query side,
slow analyzer path) and a vectorized Arrow form over a flat token array
(index side: one ``ends_with``/``replace_slice`` kernel chain per rule,
no per-token Python). The two forms are property-tested equal.

The minimal stemmer is also expressible as a SQL CASE chain, which is
what gives the ``stemmed_topk`` oracle entry exact cross-engine parity.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_APOSTROPHES = ("'", "’", "＇")

STEMMERS = ("none", "minimal_english")


def strip_possessive_token(tok: str) -> str:
    """EnglishPossessiveFilter semantics for one (already lowercased) token."""
    if len(tok) >= 2 and tok[-1] == "s" and tok[-2] in _APOSTROPHES:
        return tok[:-2]
    return tok


def stem_minimal_english_token(tok: str) -> str:
    """EnglishMinimalStemmer semantics for one (already lowercased) token."""
    n = len(tok)
    if n < 3 or tok[-1] != "s":
        return tok
    c2 = tok[-2]
    if c2 in ("u", "s"):
        return tok
    if c2 == "e":
        if n > 3 and tok[-3] == "i" and tok[-4] not in ("a", "e"):
            return tok[:-3] + "y"
        if tok[-3] in ("i", "a", "o", "e"):
            return tok
    return tok[:-1]


def apply_token_filters(
    tok: str, strip_poss: bool, stemmer: str, fold_ascii: bool = False
) -> str:
    if fold_ascii:
        tok = fold_ascii_token(tok)
    if strip_poss:
        tok = strip_possessive_token(tok)
    if stemmer == "minimal_english":
        tok = stem_minimal_english_token(tok)
    return tok


# Vectorized forms over a flat pa.StringArray -------------------------------

_BIG = 1 << 30  # "to end of string" for ReplaceSliceOptions


def strip_possessive_flat(flat: pa.Array) -> pa.Array:
    ends = pc.or_(
        pc.ends_with(flat, pattern="'s"),
        pc.or_(
            pc.ends_with(flat, pattern="’s"),
            pc.ends_with(flat, pattern="＇s"),
        ),
    )
    # len >= 2 is implied: a bare "'s" strips to "" exactly like Lucene
    stripped = pc.utf8_replace_slice(flat, start=-2, stop=_BIG, replacement="")
    return pc.if_else(ends, stripped, flat)


def stem_minimal_english_flat(flat: pa.Array) -> pa.Array:
    n = pc.utf8_length(flat)
    cand = pc.and_(pc.greater_equal(n, 3), pc.ends_with(flat, pattern="s"))
    keep = pc.or_(pc.ends_with(flat, pattern="us"), pc.ends_with(flat, pattern="ss"))
    ies = pc.ends_with(flat, pattern="ies")
    ies_tx = pc.and_(
        pc.and_(ies, pc.greater(n, 3)),
        pc.invert(
            pc.or_(
                pc.ends_with(flat, pattern="aies"),
                pc.ends_with(flat, pattern="eies"),
            )
        ),
    )
    es_keep = pc.or_(
        pc.or_(ies, pc.ends_with(flat, pattern="aes")),
        pc.or_(pc.ends_with(flat, pattern="oes"), pc.ends_with(flat, pattern="ees")),
    )
    to_y = pc.utf8_replace_slice(flat, start=-3, stop=_BIG, replacement="y")
    drop_s = pc.utf8_replace_slice(flat, start=-1, stop=_BIG, replacement="")
    act = pc.and_(cand, pc.invert(keep))
    out = pc.if_else(pc.and_(act, ies_tx), to_y, flat)
    return pc.if_else(
        pc.and_(act, pc.and_(pc.invert(ies_tx), pc.invert(es_keep))), drop_s, out
    )


def _build_fold_table() -> dict[int, str]:
    """ASCIIFoldingFilter mapping, Latin-1 Supplement + Latin Extended-A
    subset (the range web text actually hits): NFKD-decompose and drop
    combining marks, plus Lucene's non-decomposable specials (ae/oe/ss/
    th/d/o/l ligatures and letters). Folding beyond this range is out of
    scope (documented subset of Lucene's full-BMP table)."""
    import unicodedata

    table: dict[int, str] = {}
    specials = {
        "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ß": "ss",
        "ø": "o", "Ø": "O", "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
        "đ": "d", "Đ": "D", "ł": "l", "Ł": "L", "ı": "i",
    }
    for cp in range(0x00C0, 0x0180):
        ch = chr(cp)
        if ch in specials:
            table[cp] = specials[ch]
            continue
        folded = "".join(
            c for c in unicodedata.normalize("NFKD", ch)
            if not unicodedata.combining(c)
        )
        if folded != ch and folded.isascii():
            table[cp] = folded
    return table


_FOLD_TABLE = _build_fold_table()


def fold_ascii_token(tok: str) -> str:
    return tok.translate(_FOLD_TABLE)


def fold_ascii_flat(flat: pa.Array) -> pa.Array:
    """Vectorized-gated ASCII folding over a flat token array: tokens
    are pure-ASCII in the overwhelming majority of web text, so one
    Arrow regex pass finds the exceptions and only THOSE pay the
    per-token translate — the fast/slow stitch pattern of
    analyze_column applied at token granularity."""
    import numpy as np

    mask = pc.match_substring_regex(flat, "[^\\x00-\\x7F]")
    mask_np = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
    if not mask_np.any():
        return flat
    idx = np.flatnonzero(mask_np)
    folded = pa.array(
        [fold_ascii_token(t) for t in flat.take(pa.array(idx)).to_pylist()],
        type=pa.string(),
    )
    # scatter back via one gather from [flat ++ folded] — the untouched
    # majority never round-trips through Python
    gather = np.arange(len(flat), dtype=np.int64)
    gather[idx] = len(flat) + np.arange(len(idx), dtype=np.int64)
    return pa.concat_arrays(
        [flat.cast(pa.string()), folded]
    ).take(pa.array(gather))


def apply_token_filters_flat(
    flat: pa.Array, strip_poss: bool, stemmer: str, fold_ascii: bool = False
) -> pa.Array:
    # chain order: fold first (Lucene places ASCIIFoldingFilter before
    # the language filters), then possessive, then stem
    if fold_ascii:
        flat = fold_ascii_flat(flat)
    if strip_poss:
        flat = strip_possessive_flat(flat)
    if stemmer == "minimal_english":
        flat = stem_minimal_english_flat(flat)
    return flat


def stem_sql_expr(term_expr: str) -> str:
    """The EXACT minimal_english stemmer as a DuckDB CASE chain over a
    term-valued SQL expression — the oracle twin of
    stem_minimal_english_token (rule-for-rule; see module docstring)."""
    t = term_expr
    return f"""CASE
  WHEN length({t}) < 3 OR {t} NOT LIKE '%s' THEN {t}
  WHEN {t} LIKE '%us' OR {t} LIKE '%ss' THEN {t}
  WHEN length({t}) > 3 AND {t} LIKE '%ies'
       AND substr({t}, length({t}) - 3, 1) NOT IN ('a', 'e')
       THEN substr({t}, 1, length({t}) - 3) || 'y'
  WHEN {t} LIKE '%ies' OR {t} LIKE '%aes' OR {t} LIKE '%oes' OR {t} LIKE '%ees'
       THEN {t}
  ELSE substr({t}, 1, length({t}) - 1)
END"""
