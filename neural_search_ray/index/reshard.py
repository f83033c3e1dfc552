"""Index resharding — the OpenSearch `_split` / `_shrink` analogue.

A fixed shard count is the one layout decision a 100-TB index cannot
revisit by re-ingesting: OpenSearch answers with the `_split` (N→k·N)
and `_shrink` (N→N/k) APIs, which rewrite the index into a new target
without re-analyzing any document. This module is that operation for
this engine's layout (doc_shard = doc_id % num_doc_shards,
index/build.py:19): postings are DECODED once and repacked — never
re-tokenized — so the resharded index is rank- and stats-identical to
a fresh build over the same corpus at the new shard count, for any
N→M (not just multiples; the modulo map has no Lucene routing-factor
constraint to preserve because readers address shards only through
the manifest).

Ray-Data-first shape — the same ONE-exchange pipeline as the build,
entered after tokenization:

  read_parquet(<source posting files>)          # one row per term
    .map_batches(decode_and_repack)             # vectorized, stateless
    .groupby([doc_shard, term_bucket])          # the ONE shuffle
    .map_groups(make_write_group(out_dir, ...)) # build's group writer

Doc-length sidecars ride the same exchange as the build's sentinel
rows (term "", bucket DOCLEN_BUCKET). Because the output goes through
`make_write_group` verbatim, the new index is byte-compatible with
every reader, merge, purge, and snapshot path. Resume = the build's
segment-complete rule: re-running after a crash skips a completed
target. The source index must be clean (no pending tombstones) —
purge first, so resharding never needs the tombstone union.
"""

from __future__ import annotations

import os
from dataclasses import replace

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .build import (
    DOCLEN_TERM,
    build_index,  # noqa: F401  (re-exported for callers pairing the APIs)
    index_config_from_manifest,
    make_write_group,
    pack_partial_rows,
    term_bucket_of,
)
from .codec import decoder_for, posting_gather, positions_undelta
from .manifest import DOCLEN_BUCKET, IndexManifest, SegmentManifest


def _make_repack(
    codec: str, index_positions: bool, new_num_shards: int, new_num_buckets: int
):
    """map_batches fn: source posting rows → packed partial rows keyed
    by the NEW (doc_shard, term_bucket). One decode pass, one lexsort —
    no per-posting Python."""
    decode = decoder_for(codec)

    def fn(batch: pa.Table) -> pa.Table:
        terms_col = batch["term"]
        if isinstance(terms_col, pa.ChunkedArray):
            terms_col = terms_col.combine_chunks()
        dfs = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        docs_bufs = batch["docs"].to_pylist()
        tfs_bufs = batch["tfs"].to_pylist()
        has_pos = index_positions and "pos" in batch.column_names
        pos_bufs = batch["pos"].to_pylist() if has_pos else None
        codes_row, uniq = pd.factorize(terms_col.to_pandas())
        total = int(dfs.sum())
        flat_doc = np.empty(total, dtype=np.int64)
        flat_tf = np.empty(total, dtype=np.int64)
        flat_code = np.repeat(codes_row.astype(np.int64), dfs)
        pos_parts: list[np.ndarray] = []
        at = 0
        for i, (df_i, db, tb) in enumerate(zip(dfs, docs_bufs, tfs_bufs)):
            n = int(df_i)
            flat_doc[at : at + n] = np.cumsum(decode(db, n))
            row_tf = decode(tb, n)
            flat_tf[at : at + n] = row_tf
            if has_pos:
                pdel = decode(pos_bufs[i], int(row_tf.sum()))
                pos_parts.append(
                    positions_undelta(pdel, np.cumsum(row_tf) - row_tf, row_tf)
                )
            at += n
        flat_pos = (
            (np.concatenate(pos_parts) if pos_parts else np.empty(0, np.int64))
            if has_pos
            else None
        )
        if total == 0:
            schema_probe = pack_partial_rows(
                pa.array([], type=pa.string()),
                np.empty(0, np.int64),
                np.empty(0, np.int32),
                np.empty(0, np.int32),
                np.empty(0, np.int64),
                0,
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                index_positions=index_positions,
            )
            return schema_probe.schema.empty_table()

        bucket_by_code = np.fromiter(
            (term_bucket_of(t, new_num_buckets) for t in uniq),
            dtype=np.int32,
            count=len(uniq),
        )
        p_shard = (flat_doc % new_num_shards).astype(np.int32)
        p_bucket = bucket_by_code[flat_code]
        order = np.lexsort((flat_doc, flat_code, p_bucket, p_shard))
        g_pos = None
        if has_pos:
            tok_start = np.cumsum(flat_tf) - flat_tf
            g_pos = flat_pos[posting_gather(tok_start, flat_tf, order)]
        g_code = flat_code[order]
        g_shard = p_shard[order]
        g_bucket = p_bucket[order]
        g_doc = flat_doc[order]
        g_tf = flat_tf[order]
        change = np.flatnonzero(
            (np.diff(g_code) != 0) | (np.diff(g_shard) != 0)
        )
        run_starts = np.concatenate(([0], change + 1))
        run_ends = np.concatenate((change + 1, [g_code.size]))
        run_pos_start = None
        if has_pos:
            excl = np.cumsum(g_tf) - g_tf
            run_pos_start = excl[run_starts]
        return pack_partial_rows(
            pa.array(
                [uniq[c] for c in g_code[run_starts]], type=pa.string()
            ),
            run_ends - run_starts,
            g_shard[run_starts],
            g_bucket[run_starts],
            run_starts,
            g_code.size,
            g_doc,
            g_tf,
            g_pos,
            run_pos_start,
            index_positions=index_positions,
        )

    return fn


def _make_repack_doclen(index_positions: bool, new_num_shards: int):
    """map_batches fn: source doclen rows (doc_id, dl) → the build's
    sentinel partial rows under the NEW shard map."""

    def fn(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((d, d % new_num_shards))
        d, dl = d[order], dl[order]
        shard = (d % new_num_shards).astype(np.int32)
        change = np.flatnonzero(np.diff(shard) != 0)
        starts = np.concatenate(([0], change + 1))
        return pack_partial_rows(
            pa.array([DOCLEN_TERM] * starts.size, type=pa.string()),
            np.diff(np.concatenate((starts, [shard.size]))),
            shard[starts],
            np.full(starts.size, DOCLEN_BUCKET, dtype=np.int32),
            starts,
            shard.size,
            d,
            dl,
            index_positions=index_positions,
        )

    return fn


def reshard_index(
    index_dir: str,
    out_dir: str,
    new_num_shards: int,
    *,
    new_num_salts: int | None = None,
    segment_id: str = "resharded-000",
    resume: bool = True,
) -> IndexManifest:
    """Rewrite ``index_dir`` into ``out_dir`` with ``new_num_shards``
    doc shards (and optionally a new per-shard bucket factor). Global
    stats (N, Σdl, per-term df) are preserved exactly, so BM25 results
    are rank- AND score-identical to the source index."""
    src = IndexManifest.load(index_dir)
    if src is None:
        raise ValueError(f"no index manifest under {index_dir}")
    from .deletes import load_tombstones

    if load_tombstones(index_dir).size:
        raise ValueError(
            "reshard requires a clean index: purge_deletes first "
            "(pending tombstones would silently resurrect on reshard)"
        )
    if new_num_shards < 1:
        raise ValueError("new_num_shards must be >= 1")
    cfg = index_config_from_manifest(src)
    cfg = replace(
        cfg,
        num_shards=new_num_shards,
        num_salts=new_num_salts if new_num_salts is not None else cfg.num_salts,
    )
    new_buckets = cfg.num_shards * cfg.num_salts
    # the group writer must NOT re-apply ingest-time transforms: a u8
    # index's tf payload is ALREADY FeatureField-encoded (re-quantizing
    # would corrupt it), and static pruning already happened at flush —
    # reshard is a pure layout rewrite. The OUTPUT manifest still
    # records the source's quantization so readers decode identically.
    write_cfg = replace(cfg, weight_quantization="none", n_postings=-1)

    os.makedirs(out_dir, exist_ok=True)
    out_manifest = IndexManifest.load(out_dir)
    if (
        resume
        and out_manifest is not None
        and segment_id in out_manifest.segments
        and out_manifest.segments[segment_id]["complete"]
    ):
        return out_manifest

    post_paths, dl_paths = [], []
    for seg in src.complete_segments():
        for f in seg["files"]:
            p = os.path.join(index_dir, f["path"])
            (dl_paths if f["term_bucket"] == DOCLEN_BUCKET else post_paths).append(p)

    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        partials = ray.data.read_parquet(post_paths).map_batches(
            _make_repack(
                src.posting_codec, src.index_positions,
                new_num_shards, new_buckets,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        dl_partials = ray.data.read_parquet(dl_paths).map_batches(
            _make_repack_doclen(src.index_positions, new_num_shards),
            batch_format="pyarrow",
            batch_size=None,
        )
        rows = (
            partials.union(dl_partials)
            .groupby(["doc_shard", "term_bucket"])
            .map_groups(
                make_write_group(out_dir, segment_id, write_cfg),
                batch_format="pyarrow",
            )
            .take_all()
        )
    finally:
        ctx.shuffle_strategy = prev

    from dataclasses import asdict

    seg = SegmentManifest(
        segment_id=segment_id,
        input_files=[f"reshard:{index_dir}:{s['segment_id']}"
                     for s in src.complete_segments()],
        n_docs=sum(r["n_docs"] for r in rows),
        sum_dl=sum(r["sum_dl"] for r in rows),
        files=[
            {
                "doc_shard": r["doc_shard"],
                "term_bucket": r["term_bucket"],
                "path": r["path"],
                "n_terms": r["n_terms"],
                "n_postings": r["n_postings"],
            }
            for r in rows
        ],
        complete=True,
    )
    manifest = out_manifest or IndexManifest(
        num_doc_shards=cfg.num_shards,
        num_term_buckets=new_buckets,
        block_size=cfg.block_size,
        analyzer=src.analyzer,
        bm25=src.bm25,
        weight_quantization=src.weight_quantization,
        posting_codec=src.posting_codec,
        index_positions=src.index_positions,
    )
    manifest.segments[segment_id] = asdict(seg)
    manifest.save(out_dir)
    return manifest
