"""Text chunking algorithms (3), re-specified from the reference's
text_chunking processor (processor/TextChunkingProcessor.java:49-286 and
processor/chunker/*.java — semantics matched, code not copied).

All three are pure functions of (content, params) → list[str], used as
stateless ``map_batches`` stages (``chunk_column``).

- fixed_token_length (FixedTokenLengthChunker.java:119-156): chunks of
  ``token_limit`` tokens cut at token START offsets in the original text
  (gap characters between passages are included at the END of the
  preceding chunk; the first chunk starts at char 0); overlap =
  floor(token_limit * overlap_rate) tokens.
- delimiter (DelimiterChunker.java:66-90): split on a literal delimiter,
  delimiter kept at chunk END; trailing remainder is its own chunk.
- fixed_char_length (FixedCharLengthChunker.java:95-115): chunks of
  ``char_limit`` chars advancing by char_limit - floor(char_limit *
  overlap_rate); the final chunk runs to the end of content.

``max_chunk_limit`` (default 100, -1 disables): the remainder of the
content is folded into the FINAL chunk so a single string yields at most
``max_chunk_limit`` chunks total (Chunker.checkRunTimeMaxChunkLimit
fires when chunkResultSize + chunkStringCount >= limit with
chunk_string_count == 1 for a single string; the multi-string
bookkeeping is an ingest-batch concern we don't need).
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

from ..analysis.analyzer import _TOKENIZER_RES, _WORD_RE
from ..config import AnalyzerConfig

DEFAULT_TOKEN_LIMIT = 384
DEFAULT_CHAR_LIMIT = 2048
DEFAULT_DELIMITER = "\n\n"
DEFAULT_MAX_CHUNK_LIMIT = 100


def _token_start_offsets(content: str, tokenizer: str = "standard") -> list[int]:
    """Start offsets of analyzer tokens (tokenizer from the reference's
    whitelist: standard | whitespace | letter)."""
    return [m.start() for m in _TOKENIZER_RES[tokenizer].finditer(content)]


def chunk_fixed_token_length(
    content: str,
    token_limit: int = DEFAULT_TOKEN_LIMIT,
    overlap_rate: float = 0.0,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
    tokenizer: str = "standard",
) -> list[str]:
    if not 0.0 <= overlap_rate <= 0.5:
        raise ValueError("overlap_rate must be within [0, 0.5]")
    if token_limit <= 0:
        raise ValueError("token_limit must be positive")
    starts = _token_start_offsets(content, tokenizer)
    n = len(starts)
    out: list[str] = []
    overlap = math.floor(token_limit * overlap_rate)
    i = 0
    while i < n:
        start_pos = 0 if i == 0 else starts[i]
        if max_chunk_limit != -1 and len(out) >= max_chunk_limit - 1:
            out.append(content[start_pos:])
            break
        if i + token_limit >= n:
            out.append(content[start_pos:])
            break
        out.append(content[start_pos : starts[i + token_limit]])
        i += token_limit - overlap
    return out


def chunk_delimiter(
    content: str,
    delimiter: str = DEFAULT_DELIMITER,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
) -> list[str]:
    if not delimiter:
        raise ValueError("delimiter must be non-empty")
    out: list[str] = []
    start = 0
    pos = content.find(delimiter)
    while pos != -1:
        if max_chunk_limit != -1 and len(out) >= max_chunk_limit - 1:
            break
        end = pos + len(delimiter)
        out.append(content[start:end])
        start = end
        pos = content.find(delimiter, start)
    if start < len(content):
        out.append(content[start:])
    return out


def chunk_fixed_char_length(
    content: str,
    char_limit: int = DEFAULT_CHAR_LIMIT,
    overlap_rate: float = 0.0,
    max_chunk_limit: int = DEFAULT_MAX_CHUNK_LIMIT,
) -> list[str]:
    if not 0.0 <= overlap_rate <= 0.5:
        raise ValueError("overlap_rate must be within [0, 0.5]")
    if char_limit <= 0:
        raise ValueError("char_limit must be positive")
    interval = char_limit - math.floor(char_limit * overlap_rate)
    out: list[str] = []
    start = 0
    n = len(content)
    while start < n:
        if max_chunk_limit != -1 and len(out) >= max_chunk_limit - 1:
            out.append(content[start:])
            break
        if start + char_limit >= n:
            out.append(content[start:])
            break
        out.append(content[start : start + char_limit])
        start += interval
    return out


CHUNKER_ALGORITHMS = {
    "fixed_token_length": chunk_fixed_token_length,
    "delimiter": chunk_delimiter,
    "fixed_char_length": chunk_fixed_char_length,
}


def make_chunk_stage(
    algorithm: str,
    text_column: str = "text",
    id_column: str = "doc_id",
    **params,
):
    """map_batches fn: explode each doc into (doc_id, chunk_idx, chunk) rows.

    The Ray form of ChunkerFactory (processor/chunker/ChunkerFactory.java:1-46).
    """
    chunker = CHUNKER_ALGORITHMS[algorithm]

    def fn(batch: pa.Table) -> pa.Table:
        ids, idxs, chunks = [], [], []
        for doc_id, text in zip(
            batch[id_column].to_pylist(), batch[text_column].to_pylist()
        ):
            for i, c in enumerate(chunker(text or "", **params)):
                ids.append(doc_id)
                idxs.append(i)
                chunks.append(c)
        return pa.table(
            {
                id_column: pa.array(ids, type=pa.int64()),
                "chunk_idx": pa.array(idxs, type=pa.int64()),
                "chunk": pa.array(chunks, type=pa.string()),
            }
        )

    return fn
