"""Completion-suggester contexts: per-(context, term) document
frequencies, built at index time.

ES/OpenSearch completion fields with a ``contexts`` mapping (category
contexts) index every suggestion once per context value, so a
context-filtered suggest is a prefix walk over the context-qualified
FST — never a post-filter over postings. Ray restatement: ONE
partial+final exchange builds the (context, term, df) table (df =
distinct docs holding the term within that context); the suggester is
then a binary-search slice per (context, prefix), exactly like the
plain completion suggester over the term dictionary
(query/engine.py suggest_completion — reference consumes Lucene's
suggest FSTs through the OpenSearch suggest API).

Scale shape: the per-batch combiner emits one row per DISTINCT
(context, term) per batch (never per token), the exchange groups on the
term (contexts ride along — same-term rows co-locate, keeping the
groupby key universe identical to the term dictionary's), and the
result is written as a sorted Parquet sidecar next to the index so a
searcher process memory-maps one bounded table.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..analysis.analyzer import analyze_column
from ..config import AnalyzerConfig

SIDECAR = "completion_contexts.parquet"


def build_completion_contexts(
    ds: "ray.data.Dataset",
    out_dir: str,
    *,
    context_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: AnalyzerConfig = AnalyzerConfig(),
) -> str:
    """Build the (context, term, df) sidecar; returns its path.
    Idempotent: an existing sidecar is kept (delete to rebuild)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, SIDECAR)
    if os.path.exists(path):
        return path

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lists = analyze_column(col, analyzer)
        lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
        flat = pc.list_flatten(lists)
        ctx = batch[context_col]
        if isinstance(ctx, pa.ChunkedArray):
            ctx = ctx.combine_chunks()
        doc_of_tok = np.repeat(np.arange(lens.size), lens)
        t = pa.table(
            {
                "ctx": ctx.take(pa.array(doc_of_tok)),
                "term": flat,
                "doc": batch[id_col].take(pa.array(doc_of_tok)),
            }
        )
        # distinct (ctx, term, doc) then count docs per (ctx, term):
        # one row per distinct pair per batch leaves the combiner
        g = pa.TableGroupBy(t, ["ctx", "term", "doc"]).aggregate([])
        g2 = pa.TableGroupBy(
            g.select(["ctx", "term"]), ["ctx", "term"]
        ).aggregate([([], "count_all")])
        return g2.rename_columns(["ctx", "term", "df"])

    from ray.data.aggregate import Sum

    # NOTE: a doc's term can appear in several batches only if the doc
    # itself spans batches — map_batches never splits a row, so the
    # per-batch distinct is globally correct.
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["ctx", "term"])
        .aggregate(Sum("df", alias_name="df"))
    )
    tbl = pa.Table.from_pylist(agg.take_all())  # bounded: dictionary-sized
    tbl = pa.table(
        {
            "ctx": tbl["ctx"].cast(pa.string()),
            "term": tbl["term"].cast(pa.string()),
            "df": tbl["df"].cast(pa.int64()),
        }
    ).sort_by([("ctx", "ascending"), ("term", "ascending")])
    pq.write_table(tbl, path)
    return path


class ContextSuggester:
    """Binary-search prefix slices over the sorted (ctx, term) sidecar —
    loaded once per process (actor __init__ discipline)."""

    def __init__(self, out_dir: str):
        tbl = pq.read_table(os.path.join(out_dir, SIDECAR))
        # composite sort key: ctx \x00 term (neither contains \x00)
        self._keys = np.asarray(
            [
                f"{c}\x00{t}"
                for c, t in zip(
                    tbl["ctx"].to_pylist(), tbl["term"].to_pylist()
                )
            ],
            dtype=object,
        )
        self._terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
        self._df = tbl["df"].to_numpy()

    def suggest(
        self, prefix: str, context: str, size: int | None = 5
    ) -> tuple[list[str], np.ndarray]:
        """Terms under ``prefix`` within ``context``, ordered
        (df desc, term asc) — the category-context suggest contract."""
        lo = np.searchsorted(self._keys, f"{context}\x00{prefix}")
        hi = np.searchsorted(
            self._keys, f"{context}\x00{prefix}" + chr(0x10FFFF)
        )
        terms = self._terms[lo:hi]
        weights = self._df[lo:hi].astype(np.int64)
        order = np.lexsort((terms, -weights))
        if size is not None:
            order = order[:size]
        return [str(t) for t in terms[order]], weights[order]
