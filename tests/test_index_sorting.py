"""Index sorting + early-terminating sorted top-k
(index/docvalues.py build_sorted_values / sorted_topk)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray

from neural_search_ray.index.docvalues import (
    SORTED_DIR,
    build_sorted_values,
    sorted_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sorted_idx(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("sortidx"))
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    )
    build_sorted_values(ds, d, num_shards=4, sort_field="n_chars")
    return d


def _expected(k):
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
    ).to_pandas()
    return df.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(
        k
    )


class TestSortedTopk:
    def test_matches_full_sort(self, sorted_idx):
        got = sorted_topk(sorted_idx, "n_chars", 25).to_pandas()
        exp = _expected(25)
        assert got.doc_id.tolist() == exp.doc_id.tolist()
        assert got.n_chars.tolist() == exp.n_chars.tolist()
        assert got.lang.tolist() == exp.lang.tolist()

    def test_k_exceeds_corpus(self, sorted_idx):
        got = sorted_topk(sorted_idx, "n_chars", 10_000).to_pandas()
        exp = _expected(10_000)
        assert len(got) == len(exp)
        assert got.doc_id.tolist() == exp.doc_id.tolist()

    def test_head_k_reads_only(self, sorted_idx):
        """Early termination is real: the per-shard head read returns at
        most k rows per shard, so the merged candidate pool is bounded
        by k × num_shards, not the corpus."""
        k = 5
        got = sorted_topk(sorted_idx, "n_chars", k)
        assert len(got) == k
        # files were written with small row groups so a head-k read
        # touches one group
        tag_dir = os.path.join(sorted_idx, SORTED_DIR, "n_chars_desc")
        f = [p for p in os.listdir(tag_dir) if p.endswith(".parquet")][0]
        assert pq.ParquetFile(os.path.join(tag_dir, f)).metadata.row_group(
            0
        ).num_rows <= 1024

    def test_direction_mismatch_refused(self, sorted_idx):
        with pytest.raises(FileNotFoundError):
            sorted_topk(sorted_idx, "n_chars", 5, descending=False)
        with pytest.raises(FileNotFoundError):
            sorted_topk(sorted_idx, "lang", 5)

    def test_resume_skips_existing(self, sorted_idx, ray_session):
        ds = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
        )
        assert (
            build_sorted_values(
                ds, sorted_idx, num_shards=4, sort_field="n_chars"
            )
            == []
        )

    def test_ascending_build(self, tmp_path, ray_session):
        d = str(tmp_path)
        ds = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
        )
        build_sorted_values(
            ds, d, num_shards=2, sort_field="n_chars", descending=False
        )
        got = sorted_topk(d, "n_chars", 10, descending=False).to_pandas()
        df = pq.read_table(
            f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]
        ).to_pandas()
        exp = df.sort_values(["n_chars", "doc_id"]).head(10)
        assert got.doc_id.tolist() == exp.doc_id.tolist()
