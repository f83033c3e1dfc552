"""Sequence packing: assign each document's tokens to fixed-length
training sequences — the "pack tokenized docs into L-token examples"
step of an LLM training-data pipeline.

Output rows are SPANS: ``(doc_id, seq_id, doc_start, seq_start,
n_tokens)`` — tokens ``[doc_start, doc_start+n_tokens)`` of ``doc_id``
land in sequence ``seq_id`` at position ``seq_start``. Docs are packed
back-to-back in doc_id order with no padding between docs (GPT-style
concat-then-chunk packing); every sequence is exactly ``seq_len`` tokens
except the last. Empty docs produce no spans.

Distributed shape — the global token offset of each doc is a PREFIX SUM
over all earlier docs, computed without ever materializing the corpus
driver-side (the classic two-pass scan):

1. per-batch combiner: token counts summed per ``bucket = doc_id //
   bucket_span`` → one row per (bucket, batch);
2. ``groupby(bucket).sum`` → one row per bucket (n_docs / bucket_span
   rows — the ONLY thing the driver reads; at 10^10 docs and
   bucket_span 2^20 that is ~10^4 scalars), exclusive-prefix-summed on
   the driver and broadcast via ``ray.put``;
3. ``groupby(bucket).map_groups``: each bucket group sorts its docs,
   cumsums locally, adds the broadcast bucket offset, and expands spans
   with vectorized repeat/arange arithmetic.

Two shuffles total, both over scalar rows keyed by a uniform integer
bucket (no skew: buckets are fixed doc_id ranges)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

DEFAULT_BUCKET_SPAN = 4096


def count_tokens(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Non-empty single-space-split token count per row (matches the
    DuckDB oracle's list_filter(string_split(text,' '), x<>'')), as one
    Arrow C++ regex kernel."""
    n = pc.count_substring_regex(col, "[^ ]+")
    return pc.coalesce(n, pa.scalar(0, n.type)).to_numpy(zero_copy_only=False).astype(np.int64)


def expand_spans(
    ids: np.ndarray, n: np.ndarray, before: np.ndarray, L: int
) -> dict[str, np.ndarray]:
    """Pure span-expansion kernel: docs with token counts ``n`` whose
    global token offsets are ``before`` → one row per (doc, sequence)
    overlap. Vectorized repeat/arange; empty docs must be pre-filtered."""
    first = before // L
    spans = (before + n - 1) // L - first + 1
    total = int(spans.sum())
    # concatenated per-doc arange: seq_id = first + 0..spans-1
    idx = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(spans) - spans, spans)
    seq_id = np.repeat(first, spans) + idx
    g0 = seq_id * L
    r_before = np.repeat(before, spans)
    r_end = np.repeat(before + n, spans)
    start = np.maximum(g0, r_before)
    end = np.minimum(g0 + L, r_end)
    return {
        "doc_id": np.repeat(ids, spans),
        "seq_id": seq_id,
        "doc_start": start - r_before,
        "seq_start": start - g0,
        "n_tokens": end - start,
    }


def pack_sequences(
    ds: "ray.data.Dataset",
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_span: int = DEFAULT_BUCKET_SPAN,
) -> "ray.data.Dataset":
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def bucket_counts(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = count_tokens(batch[text_col])
        bucket = ids // bucket_span
        ub, inv = np.unique(bucket, return_inverse=True)
        sums = np.zeros(ub.size, dtype=np.int64)
        np.add.at(sums, inv, n)
        return pa.table({"bucket": pa.array(ub), "tokens": pa.array(sums)})

    part = (
        ds.map_batches(bucket_counts, batch_format="pyarrow")
        .groupby("bucket")
        .sum("tokens")
    )
    # one row per bucket — small by construction; this is the only
    # driver-side materialization
    rows = part.take_all()
    buckets = np.asarray([r["bucket"] for r in rows], dtype=np.int64)
    totals = np.asarray([r["sum(tokens)"] for r in rows], dtype=np.int64)
    order = np.argsort(buckets)
    buckets, totals = buckets[order], totals[order]
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))
    offsets_ref = ray.put((buckets, offsets))

    def to_bucket_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids // bucket_span),
                "doc_id": pa.array(ids),
                "n": pa.array(count_tokens(batch[text_col])),
            }
        )

    L = int(seq_len)

    def expand(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "seq_id": pa.array([], pa.int64()),
                "doc_start": pa.array([], pa.int64()),
                "seq_start": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.size == 0:
            return empty
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(ids)
        ids, n = ids[o], n[o]
        bks, offs = ray.get(offsets_ref)
        base = offs[np.searchsorted(bks, ids[0] // bucket_span)]
        before = base + np.cumsum(n) - n
        keep = n > 0
        ids, n, before = ids[keep], n[keep], before[keep]
        if ids.size == 0:
            return empty
        out = expand_spans(ids, n, before, L)
        return pa.table({k: pa.array(v) for k, v in out.items()})

    return (
        ds.map_batches(to_bucket_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(expand, batch_format="pyarrow")
    )
