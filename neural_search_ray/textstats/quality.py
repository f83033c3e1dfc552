"""Document quality scoring for training-data filtering.

Per-doc stats computed in one vectorized ``map_batches`` pass:
n_chars, n_tokens (standard analyzer), n_unique_tokens, stopword_ratio
(Lucene English stop set over tokens), mean_token_len. All are
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.analyzer import ENGLISH_STOPWORDS, tokenize


def quality_stats_stage(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Batch-vectorized: one analyze_column pass (tfvec kernel); term
    lengths and stopword membership computed once per UNIQUE batch term;
    per-doc sums via scatter-add. Matches the scalar definition exactly
    (pytest parity)."""
    import pyarrow.compute as pc

    from ..stages.tfvec import doc_term_tf

    n = batch.num_rows
    filled = pc.fill_null(batch[text_col], "")
    if isinstance(filled, pa.ChunkedArray):
        filled = filled.combine_chunks()
    n_chars = pc.utf8_length(filled).cast(pa.int64()).to_numpy(zero_copy_only=False)
    doc_idx, codes, tf, uniques = doc_term_tf(
        batch, id_column=id_col, text_column=text_col
    )
    n_tokens = np.zeros(n, dtype=np.int64)
    n_stop = np.zeros(n, dtype=np.int64)
    sum_tok_len = np.zeros(n, dtype=np.int64)
    n_unique = np.bincount(doc_idx, minlength=n) if n else np.zeros(0, np.int64)
    if codes.size:
        np.add.at(n_tokens, doc_idx, tf)
        uniq_len = (
            pc.utf8_length(uniques).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        np.add.at(sum_tok_len, doc_idx, tf * uniq_len[codes])
        uniq_stop = np.fromiter(
            (u in ENGLISH_STOPWORDS for u in uniques.to_pylist()),
            dtype=bool, count=len(uniques),
        )
        mask = uniq_stop[codes]
        np.add.at(n_stop, doc_idx[mask], tf[mask])
    from ..pipelines.suite import round_half_up

    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = np.where(n_tokens > 0, n_stop / np.maximum(n_tokens, 1), 0.0)
        mean_len = np.where(n_tokens > 0, sum_tok_len / np.maximum(n_tokens, 1), 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "n_unique_tokens": pa.array(n_unique),
            "stopword_ratio": pa.array(round_half_up(stop_ratio, 6)),
            "mean_token_len": pa.array(round_half_up(mean_len, 6)),
        }
    )
