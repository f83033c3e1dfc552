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
