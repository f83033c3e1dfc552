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
  \\w minus underscore), where a single *mid-letter* character from
  ``' ’ . :`` may join two alphanumeric runs (so ``don't``,
  ``example.com``, ``3.14`` are single tokens), and a single *mid-number*
  ``,`` may join two digit runs (``1,024``).
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

from ..config import AnalyzerConfig

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words)
ENGLISH_STOPWORDS = frozenset(
    [
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with",
    ]
)

# alnum run, optionally joined by single mid-letter chars (' ’ . :) between
# alnum runs; digits additionally joined by ','.
_WORD_RE = re.compile(r"[^\W_]+(?:['’.:,][^\W_]+)*", re.UNICODE)
# trailing/leading joiners never match because the joiner must sit between runs.


@lru_cache(maxsize=8)
def _stop_tuple(remove: bool) -> frozenset[str]:
    return ENGLISH_STOPWORDS if remove else frozenset()


def tokenize(text: str, config: AnalyzerConfig = AnalyzerConfig()) -> list[str]:
    """Analyze one string → list of tokens. Pure function of (text, config)."""
    if not text:
        return []
    raw = _WORD_RE.findall(text)
    mtl = config.max_token_length
    out: list[str] = []
    stops = _stop_tuple(config.remove_stopwords)
    lower = config.lowercase
    for tok in raw:
        if lower:
            tok = tok.lower()
        if len(tok) > mtl:
            # Lucene splits over-long tokens into max-length pieces
            for i in range(0, len(tok), mtl):
                piece = tok[i : i + mtl]
                if piece not in stops:
                    out.append(piece)
        elif tok not in stops:
            out.append(tok)
    return out


# Batch/vectorized form ------------------------------------------------------

def analyze(texts, config: AnalyzerConfig = AnalyzerConfig()) -> list[list[str]]:
    """Analyze a sequence of strings → list of token lists."""
    return [tokenize(t if t is not None else "", config) for t in texts]


def analyze_column(
    col: pa.ChunkedArray | pa.Array,
    config: AnalyzerConfig = AnalyzerConfig(),
) -> pa.ListArray:
    """Analyze an Arrow string column → Arrow list<string> column.

    Builds the list array from flat offsets to avoid per-row Python list
    boxing on the output side.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    texts = col.to_pylist()
    token_lists = analyze(texts, config)
    offsets = np.zeros(len(token_lists) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in token_lists], out=offsets[1:])
    flat = [tok for toks in token_lists for tok in toks]
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.string()))


def term_frequencies(tokens: list[str]) -> dict[str, int]:
    """token list → {term: tf}. Sparse-encoding analogue of the reference's
    analyzer-based token→weight map (util/TokenWeightUtil.java:42-57)."""
    tf: dict[str, int] = {}
    for t in tokens:
        tf[t] = tf.get(t, 0) + 1
    return tf
