"""Index resharding (index/reshard.py — the _split/_shrink analogue):
rank+score identity across shard-count changes, stats preservation,
positional carry-through, resume, and the dirty-index refusal."""

import numpy as np
import pytest

import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import IndexConfig
from neural_search_ray.index.build import build_index
from neural_search_ray.index.reshard import reshard_index
from neural_search_ray.query.engine import IndexSearcher

QUERIES = ["data query", "the fast join", "merge sort window", "vector search"]


def _docs(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


@pytest.fixture(scope="module")
def src_index(tmp_path_factory, sf_dir, ray_session):
    d = str(tmp_path_factory.mktemp("rs_src"))
    build_index(_docs(sf_dir), d, IndexConfig(num_shards=4, num_salts=2))
    return d


class TestReshard:
    @pytest.mark.parametrize("new_shards", [2, 7])
    def test_rank_and_score_identity(
        self, src_index, tmp_path_factory, new_shards
    ):
        out = str(tmp_path_factory.mktemp(f"rs_out{new_shards}"))
        m = reshard_index(src_index, out, new_shards)
        assert m.num_doc_shards == new_shards
        s_src = IndexSearcher(src_index)
        s_new = IndexSearcher(out)
        assert s_new.n_docs == s_src.n_docs
        assert s_new.avgdl == s_src.avgdl
        for q in QUERIES:
            d0, sc0 = s_src.search_bm25(tokenize(q), k=20)
            d1, sc1 = s_new.search_bm25(tokenize(q), k=20)
            np.testing.assert_array_equal(d0, d1)
            np.testing.assert_allclose(sc0, sc1, rtol=0, atol=0)

    def test_resume_skips_complete(self, src_index, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("rs_resume"))
        m1 = reshard_index(src_index, out, 3)
        m2 = reshard_index(src_index, out, 3)  # no-op: segment complete
        assert m1.segments.keys() == m2.segments.keys()

    def test_refuses_dirty_index(self, sf_dir, tmp_path_factory, ray_session):
        from neural_search_ray.index.deletes import delete_docs

        d = str(tmp_path_factory.mktemp("rs_dirty"))
        build_index(_docs(sf_dir), d, IndexConfig(num_shards=2, num_salts=2))
        delete_docs(d, np.asarray([0, 11], dtype=np.int64))
        with pytest.raises(ValueError, match="purge"):
            reshard_index(d, d + "-out", 4)

    def test_positions_carry_through(
        self, sf_dir, tmp_path_factory, ray_session
    ):
        src = str(tmp_path_factory.mktemp("rs_pos_src"))
        build_index(
            _docs(sf_dir), src,
            IndexConfig(num_shards=4, num_salts=2, index_positions=True),
        )
        out = str(tmp_path_factory.mktemp("rs_pos_out"))
        reshard_index(src, out, 3)
        s_src, s_new = IndexSearcher(src), IndexSearcher(out)
        for q in QUERIES:
            d0, sc0 = s_src.search_phrase(tokenize(q), k=20)
            d1, sc1 = s_new.search_phrase(tokenize(q), k=20)
            np.testing.assert_array_equal(d0, d1)
            np.testing.assert_allclose(sc0, sc1, rtol=0, atol=0)

    def test_matches_fresh_build_at_target_sharding(
        self, sf_dir, src_index, tmp_path_factory
    ):
        out = str(tmp_path_factory.mktemp("rs_vs_fresh_out"))
        reshard_index(src_index, out, 5)
        fresh = str(tmp_path_factory.mktemp("rs_vs_fresh"))
        build_index(
            _docs(sf_dir), fresh, IndexConfig(num_shards=5, num_salts=2)
        )
        s_a, s_b = IndexSearcher(out), IndexSearcher(fresh)
        assert s_a.n_docs == s_b.n_docs
        for q in QUERIES:
            d0, sc0 = s_a.search_bm25(tokenize(q), k=20)
            d1, sc1 = s_b.search_bm25(tokenize(q), k=20)
            np.testing.assert_array_equal(d0, d1)
            np.testing.assert_allclose(sc0, sc1, rtol=0, atol=0)
