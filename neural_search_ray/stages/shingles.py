"""Word n-gram (shingle) subfield generation — the search_as_you_type
index side.

ES/OpenSearch's ``search_as_you_type`` field type materializes shingle
subfields at index time (``field._2gram``, ``field._3gram`` — Lucene
ShingleFilter with output_unigrams=false) so that a ``multi_match
type=bool_prefix`` query can match multi-word partial input with phrase-
like locality at TERM-query cost. Ray restatement (the multifield model,
query/multifield.py:1): each shingle width is its OWN index over the
same doc-id space; this stage rewrites the text column into its shingle
stream ("a b c" → "a_b b_c" at n=2) and the standard build pipeline does
the rest. The "_" joiner keeps each shingle one analyzer token.

Vectorized end-to-end: the analyzer's Arrow fast path produces the token
list column, and shingles are assembled with one flatten + numpy window
index + ``binary_join_element_wise`` — no per-row Python in the hot
path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.analyzer import analyze_column
from ..config import AnalyzerConfig


def shingle_tokens(toks: list[str], n: int) -> list[str]:
    """Query-side shingling: the n-grams of an analyzed token list,
    "_"-joined — the same stream the index stage emits, so query terms
    and dictionary terms meet exactly."""
    return ["_".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def make_shingle_stage(
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: AnalyzerConfig = AnalyzerConfig(),
):
    """map_batches stage: (id, text) → (id, shingled text). Docs with
    fewer than ``n`` tokens come out empty (they stay countable rows —
    the built index keeps them in n_docs with dl=0, matching the base
    field's all-docs stats discipline)."""
    if n < 2:
        raise ValueError(f"shingle width must be >= 2, got {n}")

    def stage(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = analyze_column(col, config)
        lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
        vals = pc.list_flatten(lst)
        offs = np.concatenate([[0], np.cumsum(lens)])
        out_lens = np.maximum(lens - (n - 1), 0)
        total = int(out_lens.sum())
        if total == 0:
            shingled: pa.Array = pa.array([""] * len(batch), pa.string())
        else:
            doc_rep = np.repeat(np.arange(lens.size), out_lens)
            first = np.repeat(np.cumsum(out_lens) - out_lens, out_lens)
            within = np.arange(total) - first
            starts = offs[doc_rep] + within
            parts = [vals.take(pa.array(starts + j)) for j in range(n)]
            shingle_vals = pc.binary_join_element_wise(*parts, "_")
            new_offs = pa.array(
                np.concatenate([[0], np.cumsum(out_lens)]), pa.int32()
            )
            shingled = pc.binary_join(
                pa.ListArray.from_arrays(new_offs, shingle_vals), " "
            )
        return pa.table({id_col: batch[id_col], text_col: shingled})

    return stage


def edge_ngrams(tok: str, min_gram: int = 2, max_gram: int = 4) -> list[str]:
    """Reference form of the edge n-gram expansion of one token (Lucene
    EdgeNGramTokenFilter, preserve_original=false): prefixes of length
    min_gram..min(len, max_gram); tokens shorter than min_gram emit
    nothing."""
    return [tok[:g] for g in range(min_gram, min(len(tok), max_gram) + 1)]


def make_edge_ngram_stage(
    min_gram: int = 2,
    max_gram: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    config: AnalyzerConfig = AnalyzerConfig(),
):
    """map_batches stage: (id, text) → (id, edge-gram text) — the
    index side of the classic autocomplete mapping (index analyzer =
    edge_ngram filter, search analyzer = standard), so a partial-word
    query becomes an exact TERM lookup against the gram index instead
    of a dictionary range scan.

    Vectorized: one analyze_column pass, then ONE utf8_slice_codeunits
    kernel per gram width (scalar stop — the per-token variable bound is
    handled by masking tokens shorter than the width), stitched back
    per row with a numpy gather. Gram order within a row is by width
    then token position; BM25 is bag-of-words so the stream order never
    affects scores.
    """
    if not (1 <= min_gram <= max_gram):
        raise ValueError(
            f"need 1 <= min_gram <= max_gram, got ({min_gram}, {max_gram})"
        )

    def stage(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lst = analyze_column(col, config)
        tok_lens = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lst)
        chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of_tok = np.repeat(np.arange(tok_lens.size), tok_lens)
        seg_vals: list[pa.Array] = []
        seg_docs: list[np.ndarray] = []
        for g in range(min_gram, max_gram + 1):
            keep = np.flatnonzero(chars >= g)
            if keep.size == 0:
                continue
            sel = pa.array(keep)
            seg_vals.append(pc.utf8_slice_codeunits(flat.take(sel), 0, g))
            seg_docs.append(doc_of_tok[keep])
        if not seg_vals:
            out: pa.Array = pa.array([""] * len(batch), pa.string())
        else:
            all_vals = pa.concat_arrays(
                [v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                 for v in seg_vals]
            )
            all_docs = np.concatenate(seg_docs)
            order = np.argsort(all_docs, kind="stable")
            counts = np.bincount(all_docs, minlength=len(batch))
            new_offs = pa.array(
                np.concatenate([[0], np.cumsum(counts)]), pa.int64()
            )
            out = pc.binary_join(
                pa.ListArray.from_arrays(
                    new_offs, all_vals.take(pa.array(order))
                ),
                " ",
            )
        return pa.table({id_col: batch[id_col], text_col: out})

    return stage
