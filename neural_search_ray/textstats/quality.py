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
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    n_unique = np.empty(n, dtype=np.int64)
    n_stop = np.empty(n, dtype=np.int64)
    sum_tok_len = np.empty(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        toks = tokenize(t)
        n_chars[i] = len(t)
        n_tokens[i] = len(toks)
        n_unique[i] = len(set(toks))
        n_stop[i] = sum(1 for x in toks if x in ENGLISH_STOPWORDS)
        sum_tok_len[i] = sum(len(x) for x in toks)
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
