"""HNSW graph ANN (ann/hnsw.py): determinism, exactness escape,
realistic-ef recall, persistence roundtrip, shard merge."""

import numpy as np
import pytest

import ray.data

from neural_search_ray.ann.hnsw import (
    HNSWGraph,
    HNSWSearcher,
    build_hnsw_index,
    _levels_for_ids,
)


def _corpus(n=300, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # non-contiguous ids
    return vecs, ids


def _brute_topk(vecs, ids, q, k):
    x = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    qq = q / np.linalg.norm(q)
    sims = x @ qq
    order = np.lexsort((ids, -sims))[:k]
    return ids[order], sims[order]


class TestGraph:
    def test_levels_deterministic_and_geometric(self):
        ids = np.arange(10_000, dtype=np.int64)
        lv = _levels_for_ids(ids, 1.0 / np.log(8))
        assert (lv == _levels_for_ids(ids, 1.0 / np.log(8))).all()
        # ~1/M of nodes above level 0 for mL = 1/ln(M)
        frac = (lv > 0).mean()
        assert 0.05 < frac < 0.25

    def test_exact_at_full_ef(self):
        vecs, ids = _corpus()
        g = HNSWGraph(M=8, ef_construction=32).fit(vecs, ids)
        for qi in (0, 17, 123):
            got_ids, got_sims = g.search(vecs[qi], k=10, ef=ids.size)
            want_ids, want_sims = _brute_topk(vecs, ids, vecs[qi], 10)
            assert (got_ids == want_ids).all()
            assert np.allclose(got_sims, want_sims)

    def test_recall_at_realistic_ef(self):
        vecs, ids = _corpus(n=500)
        g = HNSWGraph(M=8, ef_construction=64).fit(vecs, ids)
        hits = total = 0
        for qi in range(0, 500, 25):
            got, _ = g.search(vecs[qi], k=10, ef=48)
            want, _ = _brute_topk(vecs, ids, vecs[qi], 10)
            hits += len(set(got) & set(want))
            total += 10
        assert hits / total >= 0.9

    def test_deterministic_rebuild(self):
        vecs, ids = _corpus(n=200)
        g1 = HNSWGraph(M=6, ef_construction=24).fit(vecs, ids)
        g2 = HNSWGraph(M=6, ef_construction=24).fit(vecs, ids)
        assert g1.entry == g2.entry
        assert g1.adj == g2.adj

    def test_level0_connected_via_chain(self):
        vecs, ids = _corpus(n=120)
        g = HNSWGraph(M=4, ef_construction=16).fit(vecs, ids)
        seen = {0}
        stack = [0]
        while stack:
            u = stack.pop()
            for v in g._neighbors(u, 0):
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        assert len(seen) == ids.size

    def test_degree_caps(self):
        vecs, ids = _corpus(n=400)
        g = HNSWGraph(M=5, ef_construction=32).fit(vecs, ids)
        for per_level in g.adj:
            for lev, nbrs in enumerate(per_level):
                assert len(nbrs) <= (2 * g.M if lev == 0 else g.M)

    def test_singleton_and_empty(self):
        g = HNSWGraph().fit(np.ones((1, 4)), np.array([42]))
        ids, sims = g.search(np.ones(4), k=5)
        assert list(ids) == [42] and sims[0] == pytest.approx(1.0)
        ge = HNSWGraph()
        ids, _ = ge.search(np.ones(4), k=5)
        assert ids.size == 0


class TestDistributed:
    @pytest.fixture(scope="class")
    def index_dir(self, ray_session, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("hnsw") / "idx")
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        build_hnsw_index(ds, out, num_shards=3, M=8, ef_construction=48)
        return out

    def test_exact_merge_matches_brute(self, index_dir):
        import pyarrow.parquet as pq

        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        ids = t["vec_id"].to_numpy()
        s = HNSWSearcher(index_dir)
        for qi in (0, 3):
            got_ids, got_sims = s.search(
                vecs[qi], k=10, ef=s.max_shard_size
            )
            want_ids, want_sims = _brute_topk(vecs, ids, vecs[qi], 10)
            assert (got_ids == want_ids).all()
            assert np.allclose(got_sims, want_sims, atol=1e-9)

    def test_actor_pool_equals_local(self, index_dir):
        import pyarrow.parquet as pq

        from neural_search_ray.ann.hnsw import DistributedHNSWSearcher

        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        local = HNSWSearcher(index_dir)
        dist = DistributedHNSWSearcher(index_dir)
        try:
            for qi in (0, 7):
                li, ls = local.search(vecs[qi], k=10, ef=32)
                di, dsims = dist.search(vecs[qi], k=10, ef=32)
                assert (li == di).all()
                assert np.allclose(ls, dsims)
        finally:
            dist.shutdown()

    def test_resume_skips_rebuild(self, index_dir):
        import os

        manifest = os.path.join(index_dir, "hnsw_manifest.json")
        before = os.path.getmtime(manifest)
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        assert build_hnsw_index(ds, index_dir) == index_dir
        assert os.path.getmtime(manifest) == before

    def test_future_layout_refused(self, index_dir, tmp_path):
        import json
        import os
        import shutil

        bad = str(tmp_path / "bad")
        shutil.copytree(index_dir, bad)
        mp = os.path.join(bad, "hnsw_manifest.json")
        m = json.load(open(mp))
        m["layout_version"] = 99
        json.dump(m, open(mp, "w"))
        with pytest.raises(ValueError, match="layout"):
            HNSWSearcher(bad)


class TestFilteredSearch:
    def test_exact_at_full_ef(self):
        vecs, ids = _corpus()
        g = HNSWGraph(M=8, ef_construction=32).fit(vecs, ids)
        accepted = np.sort(ids[::3])  # every 3rd id allowed
        aset = set(accepted.tolist())
        for qi in (0, 17, 123):
            got_ids, got_sims = g.search(
                vecs[qi], k=10, ef=ids.size, accepted_ids=accepted
            )
            m = np.isin(ids, accepted)
            want_ids, want_sims = _brute_topk(vecs[m], ids[m], vecs[qi], 10)
            assert (got_ids == want_ids).all()
            assert np.allclose(got_sims, want_sims)
            assert all(i in aset for i in got_ids.tolist())

    def test_filtered_recall_at_realistic_ef(self):
        vecs, ids = _corpus(n=500)
        g = HNSWGraph(M=8, ef_construction=64).fit(vecs, ids)
        accepted = np.sort(ids[::4])
        m = np.isin(ids, accepted)
        hits = total = 0
        for qi in range(0, 500, 25):
            got, _ = g.search(vecs[qi], k=10, ef=64, accepted_ids=accepted)
            want, _ = _brute_topk(vecs[m], ids[m], vecs[qi], 10)
            hits += len(set(got) & set(want))
            total += 10
        # during-traversal filtering: no post-filter recall collapse
        assert hits / total >= 0.85

    def test_highly_selective_filter(self):
        vecs, ids = _corpus()
        g = HNSWGraph(M=8, ef_construction=32).fit(vecs, ids)
        accepted = np.sort(ids[:3])
        got, _ = g.search(vecs[0], k=10, ef=ids.size, accepted_ids=accepted)
        assert set(got.tolist()) == set(accepted.tolist())

    def test_empty_filter(self):
        vecs, ids = _corpus()
        g = HNSWGraph(M=8, ef_construction=32).fit(vecs, ids)
        got, sims = g.search(
            vecs[0], k=5, ef=64, accepted_ids=np.array([-1], dtype=np.int64)
        )
        assert got.size == 0 and sims.size == 0
