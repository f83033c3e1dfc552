"""Forward index + SEISMIC clustering + cluster-skipping ANN tests."""

import numpy as np
import pytest
import ray

from neural_search_ray.config import IndexConfig
from neural_search_ray.corpus.generator import generate_pages
from neural_search_ray.index.build import build_index
from neural_search_ray.index.forward import ShardForward, build_forward_index
from neural_search_ray.index.seismic import build_seismic
from neural_search_ray.query.engine import IndexSearcher
from neural_search_ray.query.seismic import SeismicSearcher

QW = {"data": 2.0, "query": 1.5, "the": 1.0, "index": 1.0, "search": 0.5,
      "web": 0.5, "page": 0.5, "merge": 0.5, "sort": 0.5, "join": 0.5}


@pytest.fixture(scope="module")
def seismic_index(tmp_path_factory, ray_session):
    idx = str(tmp_path_factory.mktemp("seis"))
    build_index(generate_pages(500, seed=13), idx, IndexConfig(num_shards=2, num_salts=2))
    stats = build_forward_index(idx)
    assert sum(s["n_docs"] for s in stats) == 500
    cstats = build_seismic(idx, approximate_threshold=20, seed=42)
    assert sum(c["clustered_terms"] for c in cstats) > 0
    return idx


def test_forward_matches_postings(seismic_index):
    s = IndexSearcher(seismic_index)
    fwd = ShardForward(seismic_index, 0)
    # doc 0 lives in shard 0 (doc_id % 2); its forward row must equal the
    # per-term tfs from the inverted index
    doc = int(fwd.doc_ids[0])
    i = int(np.searchsorted(fwd.doc_ids, doc))
    sl = slice(fwd.offsets[i], fwd.offsets[i + 1])
    row = {fwd.terms[t]: w for t, w in zip(fwd.flat_tids[sl], fwd.flat_w[sl])}
    for term, w in row.items():
        docs, tfs = s.postings(term)
        pos = np.searchsorted(docs, doc)
        assert docs[pos] == doc and tfs[pos] == w, term


def test_forward_dot_scores(seismic_index):
    fwd = ShardForward(seismic_index, 0)
    qvec = np.zeros(len(fwd.terms))
    for t, w in QW.items():
        tid = fwd.term_id.get(t)
        if tid is not None:
            qvec[tid] = w
    idx = np.arange(min(50, fwd.doc_ids.size))
    got = fwd.dot_scores(idx, qvec)
    # brute-force check
    for j in idx[:10]:
        sl = slice(fwd.offsets[j], fwd.offsets[j + 1])
        want = float((qvec[fwd.flat_tids[sl]] * fwd.flat_w[sl]).sum())
        assert got[j] == pytest.approx(want)


def test_seismic_no_skip_limit_is_exact(seismic_index):
    """heap_factor→inf disables skipping → identical to exact dot search
    over the union of clustered query-term postings."""
    exact = IndexSearcher(seismic_index)
    ann = SeismicSearcher(seismic_index)
    d_ann, s_ann = ann.search(QW, k=10, heap_factor=1e9)
    d_ex, s_ex = exact.search_sparse_dot(QW, k=10)
    # all QW terms are hot (clustered) in this corpus → same candidates
    assert d_ann.tolist() == d_ex.tolist()
    assert np.allclose(s_ann, s_ex)


def test_seismic_recall_at_default_heap_factor(seismic_index):
    exact = IndexSearcher(seismic_index)
    ann = SeismicSearcher(seismic_index)
    d_ex, _ = exact.search_sparse_dot(QW, k=10)
    d_ann, _ = ann.search(QW, k=10, heap_factor=1.0)
    recall = len(set(d_ex.tolist()) & set(d_ann.tolist())) / 10
    assert recall >= 0.7  # approximate path keeps high recall


def test_seismic_deterministic(seismic_index):
    a = SeismicSearcher(seismic_index).search(QW, k=5)
    b = SeismicSearcher(seismic_index).search(QW, k=5)
    assert a[0].tolist() == b[0].tolist()
