"""skip_existing / InferenceFilter: incremental embedding reuse.

Reference semantics (InferenceProcessor.java:454-478, 675-761 +
TextInferenceFilter): when ``skip_existing`` is set, the processor
multi-gets the previously indexed documents and COPIES the stored
embedding whenever the source text is unchanged, running inference only
for new or modified texts.

Ray restatement — a distributed hash join, not a driver-side multi-get:

1. new rows  → (doc_id, text, text_hash = h64(text))
2. prev rows → (doc_id, text_hash, prev_embedding)   (prior run output)
3. ``new LEFT OUTER JOIN prev ON (doc_id, text_hash)``: a match means
   the text is unchanged → copy prev_embedding (reused=True); no match
   (new doc OR changed hash) → route through the embedding actor pool.

Everything is vectorized batch work; the join shuffles (id, hash)
scalars plus the reusable embeddings once. Inference cost is
proportional to the CHANGED set — the property that matters when
re-ingesting a 100 TB corpus with a 0.1% delta.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def hash_texts_stage(text_column: str = "text", id_column: str = "doc_id"):
    """map_batches fn: adds text_hash (h64 over the text bytes)."""
    from ..dedup.common import h64

    def fn(batch: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (h64(t or "") for t in batch[text_column].to_pylist()),
            dtype=np.uint64,
            count=batch.num_rows,
        )
        return batch.append_column("text_hash", pa.array(hs))

    return fn


def incremental_embed(
    new_ds: "ray.data.Dataset",
    prev_ds: "ray.data.Dataset | None",
    embed_stage_cls: type,
    *,
    text_column: str = "text",
    id_column: str = "doc_id",
    embed_kwargs: dict | None = None,
    concurrency: int = 2,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """→ Dataset(doc_id, text_hash, embedding, reused:bool). ``prev_ds``
    is the previous run's output (doc_id, text_hash, embedding) or None
    (first run: everything is inferred)."""
    embed_kwargs = dict(embed_kwargs or {})
    hashed = new_ds.map_batches(
        hash_texts_stage(text_column, id_column), batch_format="pyarrow"
    )

    def finish(reused_flag: bool):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_column: batch[id_column],
                    "text_hash": batch["text_hash"],
                    "embedding": batch["embedding"].cast(pa.list_(pa.float64())),
                    "reused": pa.array([reused_flag] * batch.num_rows),
                }
            )

        return fn

    def embed(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        return ds.map_batches(
            embed_stage_cls,
            fn_constructor_kwargs={"text_column": text_column, **embed_kwargs},
            concurrency=concurrency,
            batch_format="pyarrow",
        ).map_batches(finish(False), batch_format="pyarrow")

    if prev_ds is None:
        return embed(hashed)

    def prev_keyed(batch: pa.Table) -> pa.Table:
        # Acero hash joins reject list-typed payload columns — carry the
        # embedding through the join as packed float64 bytes
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.cast(pa.list_(pa.float64()))
        flat = col.flatten().to_numpy(zero_copy_only=False)
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = ((offs - offs[0]) * 8).astype(np.int32)
        packed = pa.Array.from_buffers(
            pa.binary(), len(col),
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())],
        )
        return pa.table(
            {
                id_column: batch[id_column],
                "text_hash": batch["text_hash"],
                "prev_embedding": packed,
            }
        )

    joined = hashed.join(
        prev_ds.map_batches(prev_keyed, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=num_partitions,
        on=(id_column, "text_hash"),
    )

    def split(want_reused: bool):
        def fn(batch: pa.Table) -> pa.Table:
            have_prev = pc.is_valid(batch["prev_embedding"])
            kept = batch.filter(have_prev if want_reused else pc.invert(have_prev))
            if want_reused:
                emb = pa.array(
                    [
                        np.frombuffer(b, dtype=np.float64).tolist()
                        for b in kept["prev_embedding"].to_pylist()
                    ],
                    type=pa.list_(pa.float64()),
                )
                return pa.table(
                    {
                        id_column: kept[id_column],
                        "text_hash": kept["text_hash"],
                        "embedding": emb,
                        "reused": pa.array([True] * kept.num_rows),
                    }
                )
            return kept.drop_columns(["prev_embedding"])

        return fn

    reused = joined.map_batches(split(True), batch_format="pyarrow")
    fresh = embed(joined.map_batches(split(False), batch_format="pyarrow"))
    return fresh.union(reused)
