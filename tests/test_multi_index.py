"""Multi-index search (query/multi.py): query_then_fetch local-stats
scoring with indices_boost vs dfs_query_then_fetch global-stats
scoring (bit-identical to the single union index)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import IndexConfig
from neural_search_ray.index.build import build_index
from neural_search_ray.query.engine import IndexSearcher
from neural_search_ray.query.multi import MultiIndexSearcher

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_indexes(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("midx")
    dirs = []
    for tag, want_en in (("en", True), ("rest", False)):
        def flt(batch: pa.Table, _w=want_en) -> pa.Table:
            m = pc.equal(batch["lang"], "en")
            if not _w:
                m = pc.invert(m)
            return batch.filter(m).select(["doc_id", "text"])

        d = str(root / tag)
        build_index(
            ray.data.read_parquet(
                f"{SF}/documents.parquet",
                columns=["doc_id", "text", "lang"],
            ).map_batches(flt, batch_format="pyarrow"),
            d,
            IndexConfig(num_shards=2, num_salts=1),
        )
        dirs.append(d)
    union = str(root / "union")
    build_index(
        ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        ),
        union,
        IndexConfig(num_shards=2, num_salts=1),
    )
    return dirs, union


class TestDfsMode:
    def test_bit_identical_to_union_index(self, split_indexes):
        dirs, union = split_indexes
        ms = MultiIndexSearcher(dirs)
        su = IndexSearcher(union)
        for q in ["data query", "merge sort window", "the fast join"]:
            d1, s1 = ms.search_bm25(
                tokenize(q), k=25, mode="dfs_query_then_fetch"
            )
            d2, s2 = su.search_bm25(tokenize(q), k=25)
            assert d1.tolist() == d2.tolist()
            np.testing.assert_array_equal(s1, s2)


class TestLocalMode:
    def test_matches_per_index_scores_with_boost(self, split_indexes):
        dirs, _ = split_indexes
        boosts = [1.0, 2.0]
        ms = MultiIndexSearcher(dirs, boosts=boosts)
        terms = tokenize("data query")
        docs, scores = ms.search_bm25(terms, k=1000)
        got = dict(zip(docs.tolist(), scores.tolist()))
        expect = {}
        for d, b in zip(dirs, boosts):
            s = IndexSearcher(d)
            dd, ss = s.search_bm25(terms, k=1000)
            expect.update(dict(zip(dd.tolist(), (ss * b).tolist())))
        assert got == {k: expect[k] for k in got}
        # local stats differ from global: at least one doc scores
        # differently than under dfs mode
        _, dfs_scores = ms.search_bm25(
            terms, k=1000, mode="dfs_query_then_fetch"
        )
        assert not np.array_equal(np.sort(scores), np.sort(dfs_scores))

    def test_validation(self, split_indexes):
        dirs, _ = split_indexes
        with pytest.raises(ValueError):
            MultiIndexSearcher([])
        with pytest.raises(ValueError):
            MultiIndexSearcher(dirs, boosts=[1.0])
        with pytest.raises(ValueError):
            MultiIndexSearcher(dirs).search_bm25(["data"], mode="nope")
