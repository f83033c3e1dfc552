"""Snapshot / restore (index/snapshot.py): incremental segment pooling
(segments are immutable → each copied once), exact searchable-state
round-trip including tombstones, crash-safe idempotent re-runs."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import IndexConfig
from neural_search_ray.index.build import build_index
from neural_search_ray.index.deletes import delete_docs
from neural_search_ray.index.snapshot import (
    list_snapshots,
    restore_index,
    snapshot_index,
)
from neural_search_ray.query.engine import IndexSearcher

CFG = IndexConfig(num_shards=4, num_salts=2, index_positions=True)
QUERIES = ["data query", "merge sort window", "vector search"]


def _docs_ds(sf_dir, parity=None):
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    if parity is None:
        return ds

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 2 == parity))

    return ds.map_batches(fn, batch_format="pyarrow")


def _results(searcher):
    out = []
    for q in QUERIES:
        d, s = searcher.search_bm25(tokenize(q), k=15)
        out.append((d.tolist(), [round(x, 12) for x in s.tolist()]))
    if searcher.has_positions:
        d, s = searcher.search_phrase(tokenize("data query"), k=10)
        out.append((d.tolist(), [round(x, 12) for x in s.tolist()]))
    return out


class TestSnapshotRestore:
    def test_roundtrip_rank_identical(self, tmp_path, sf_dir, ray_session):
        idx = str(tmp_path / "idx")
        build_index(_docs_ds(sf_dir), idx, CFG)
        repo = str(tmp_path / "repo")
        info = snapshot_index(idx, repo, "s1")
        assert info["segments_copied"] == info["segments_total"] == 1
        restored = str(tmp_path / "restored")
        restore_index(repo, "s1", restored)
        assert _results(IndexSearcher(restored)) == _results(IndexSearcher(idx))

    def test_incremental_copies_only_new_segments(
        self, tmp_path, sf_dir, ray_session
    ):
        idx = str(tmp_path / "idx2")
        build_index(_docs_ds(sf_dir, 0), idx, CFG, segment_id="seg-a")
        repo = str(tmp_path / "repo2")
        i1 = snapshot_index(idx, repo, "s1")
        assert i1 == {
            "name": "s1", "segments_total": 1, "segments_copied": 1,
            "tombstones": 0,
        }
        build_index(_docs_ds(sf_dir, 1), idx, CFG, segment_id="seg-b")
        i2 = snapshot_index(idx, repo, "s2")
        assert i2["segments_total"] == 2 and i2["segments_copied"] == 1
        # re-snapshot: nothing new to copy, record rewritten atomically
        i3 = snapshot_index(idx, repo, "s2")
        assert i3["segments_copied"] == 0
        assert list_snapshots(repo) == ["s1", "s2"]
        # BOTH snapshots restore independently from the shared pool
        r1, r2 = str(tmp_path / "r1"), str(tmp_path / "r2")
        m1 = restore_index(repo, "s1", r1)
        m2 = restore_index(repo, "s2", r2)
        assert set(m1.segments) == {"seg-a"}
        assert set(m2.segments) == {"seg-a", "seg-b"}
        full = str(tmp_path / "full")
        build_index(_docs_ds(sf_dir, 0), full, CFG, segment_id="seg-a")
        build_index(_docs_ds(sf_dir, 1), full, CFG, segment_id="seg-b")
        assert _results(IndexSearcher(r2)) == _results(IndexSearcher(full))

    def test_tombstones_round_trip(self, tmp_path, sf_dir, ray_session):
        idx = str(tmp_path / "idx3")
        build_index(_docs_ds(sf_dir), idx, CFG)
        s0 = IndexSearcher(idx)
        victims = s0.search_bm25(tokenize(QUERIES[0]), k=3)[0].tolist()
        delete_docs(idx, victims)
        repo = str(tmp_path / "repo3")
        info = snapshot_index(idx, repo, "with-deletes")
        assert info["tombstones"] == len(victims)
        restored = str(tmp_path / "restored3")
        restore_index(repo, "with-deletes", restored)
        # searchable view identical: deleted docs excluded, STALE stats
        assert _results(IndexSearcher(restored)) == _results(IndexSearcher(idx))
        d, _ = IndexSearcher(restored).search_bm25(tokenize(QUERIES[0]), k=15)
        assert not set(victims) & set(d.tolist())

    def test_restore_refuses_live_index(self, tmp_path, sf_dir, ray_session):
        idx = str(tmp_path / "idx4")
        build_index(_docs_ds(sf_dir), idx, IndexConfig(num_shards=2, num_salts=1))
        repo = str(tmp_path / "repo4")
        snapshot_index(idx, repo, "s1")
        with pytest.raises(FileExistsError, match="already holds"):
            restore_index(repo, "s1", idx)

    def test_missing_snapshot_and_segment(self, tmp_path, sf_dir, ray_session):
        repo = str(tmp_path / "repo5")
        with pytest.raises(FileNotFoundError):
            restore_index(repo, "nope", str(tmp_path / "out5"))
        idx = str(tmp_path / "idx5")
        build_index(_docs_ds(sf_dir), idx, IndexConfig(num_shards=2, num_salts=1))
        snapshot_index(idx, repo, "s1")
        # corrupt the pool: drop the completion marker → restore refuses
        seg = os.listdir(os.path.join(repo, "segments"))[0]
        os.remove(os.path.join(repo, "segments", seg, ".complete"))
        with pytest.raises(FileNotFoundError, match="missing from"):
            restore_index(repo, "s1", str(tmp_path / "out5b"))
        # re-snapshot repairs the pool (half-copied segment re-copied)
        info = snapshot_index(idx, repo, "s1")
        assert info["segments_copied"] == 1
        restore_index(repo, "s1", str(tmp_path / "out5b"))

    def test_restore_rerun_after_crash(self, tmp_path, sf_dir, ray_session):
        idx = str(tmp_path / "idx6")
        build_index(_docs_ds(sf_dir), idx, IndexConfig(num_shards=2, num_salts=1))
        repo = str(tmp_path / "repo6")
        snapshot_index(idx, repo, "s1")
        out = str(tmp_path / "out6")
        restore_index(repo, "s1", out)
        # simulate a crash BEFORE the manifest commit: manifest absent,
        # segments half-present → a re-run completes cleanly
        os.remove(os.path.join(out, "manifest.json"))
        shutil.rmtree(os.path.join(out, "tombstones"), ignore_errors=True)
        restore_index(repo, "s1", out)
        assert _results(IndexSearcher(out)) == _results(IndexSearcher(idx))

    def test_snapshot_skips_incomplete_segments(
        self, tmp_path, sf_dir, ray_session
    ):
        from neural_search_ray.index.manifest import IndexManifest

        idx = str(tmp_path / "idx7")
        build_index(_docs_ds(sf_dir), idx, IndexConfig(num_shards=2, num_salts=1))
        m = IndexManifest.load(idx)
        m.segments["seg-inflight"] = dict(
            next(iter(m.segments.values())), complete=False
        )
        m.save(idx)
        os.makedirs(os.path.join(idx, "segments", "seg-inflight"), exist_ok=True)
        repo = str(tmp_path / "repo7")
        info = snapshot_index(idx, repo, "s1")
        assert info["segments_total"] == 1  # the in-flight one is excluded
        restored = str(tmp_path / "out7")
        mr = restore_index(repo, "s1", restored)
        assert "seg-inflight" not in mr.segments


class TestPointInTime:
    def test_pit_isolated_from_live_mutation(
        self, tmp_path, sf_dir, ray_session
    ):
        """The PIT contract (suite q_pit_page2): a snapshot-restored
        view is FROZEN — deleting docs in the live index afterwards
        must not change any PIT result, while the live view diverges;
        page 2 via the keyset cursor equals ranks 11-20 of the frozen
        ranking."""
        from neural_search_ray.rank.paging import keyset_after_scores

        base = str(tmp_path / "base")
        build_index(_docs_ds(sf_dir), base, CFG)
        repo, pit = str(tmp_path / "repo"), str(tmp_path / "pit")
        snapshot_index(base, repo, "pit1")
        restore_index(repo, "pit1", pit)
        before = _results(IndexSearcher(pit))

        # mutate the LIVE index only
        live = IndexSearcher(base)
        d0, _ = live.search_bm25(tokenize(QUERIES[0]), k=5)
        delete_docs(base, d0[:3])
        live_after = IndexSearcher(base)
        dl, _ = live_after.search_bm25(tokenize(QUERIES[0]), k=15)
        assert not set(d0[:3].tolist()) & set(dl.tolist())  # live diverged

        pit_s = IndexSearcher(pit)
        assert _results(pit_s) == before  # PIT frozen

        # keyset page 2 == ranks 11-20 of the frozen full ranking
        d, s = pit_s.search_bm25(tokenize(QUERIES[0]), k=30)
        order = np.lexsort((d, -s))
        d, s = d[order], s[order]
        cursor = (s[9], int(d[9]))
        d2, s2 = keyset_after_scores(d, s, cursor, 10)
        assert d2.tolist() == d[10:20].tolist()
        assert np.array_equal(s2, s[10:20])
