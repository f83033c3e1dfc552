"""Property-based invariants (hypothesis) + pathological-skew build."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_ray.stages.chunkers import (
    chunk_delimiter,
    chunk_fixed_char_length,
    chunk_fixed_token_length,
)
from neural_search_ray.stages.prune import split_sparse_vector

TEXT = st.text(
    alphabet=st.sampled_from(list("abc xyz.'\n-123")), min_size=0, max_size=300
)


class TestChunkerProperties:
    @settings(max_examples=80, deadline=None)
    @given(TEXT, st.integers(1, 20))
    def test_char_chunks_reconstruct(self, text, limit):
        chunks = chunk_fixed_char_length(text, char_limit=limit, overlap_rate=0.0,
                                         max_chunk_limit=-1)
        assert "".join(chunks) == text

    @settings(max_examples=80, deadline=None)
    @given(TEXT, st.sampled_from([".", " ", "ab", "\n"]))
    def test_delimiter_chunks_reconstruct(self, text, delim):
        chunks = chunk_delimiter(text, delim, max_chunk_limit=-1)
        assert "".join(chunks) == text

    @settings(max_examples=80, deadline=None)
    @given(TEXT, st.integers(1, 10))
    def test_token_chunks_reconstruct(self, text, limit):
        chunks = chunk_fixed_token_length(text, token_limit=limit, overlap_rate=0.0,
                                          max_chunk_limit=-1)
        joined = "".join(chunks)
        # chunks cover the text from char 0 through the end whenever any
        # token exists; zero tokens → no chunks
        if chunks:
            assert joined == text
        else:
            from neural_search_ray.analysis.analyzer import tokenize

            assert tokenize(text) == []


class TestPruneProperties:
    VECS = st.dictionaries(
        st.text(alphabet="abcdef", min_size=1, max_size=4),
        st.floats(min_value=0.001, max_value=100, allow_nan=False),
        max_size=12,
    )

    @settings(max_examples=60, deadline=None)
    @given(VECS, st.integers(0, 15))
    def test_top_k_matches_sorted_prefix(self, vec, k):
        kept, pruned = split_sparse_vector("top_k", k, vec)
        assert len(kept) == min(k, len(vec))
        assert set(kept) | set(pruned) == set(vec)
        if kept and pruned:
            assert min(kept.values()) >= max(pruned.values()) or (
                # equal values split deterministically by token
                min(kept.values()) == max(pruned.values())
            )

    @settings(max_examples=60, deadline=None)
    @given(VECS, st.floats(0.0, 1.0))
    def test_alpha_mass_budget(self, vec, alpha):
        kept, _ = split_sparse_vector("alpha_mass", alpha, vec)
        if vec:
            assert sum(kept.values()) <= alpha * sum(vec.values()) + 1e-9


def test_pathological_skew_build(tmp_path, ray_session):
    """Every doc is pure stopwords: the hottest possible term skew. The
    build must complete with the hot term split across shard groups and
    queries must stay exact."""
    import pyarrow as pa
    import ray

    from neural_search_ray.config import IndexConfig
    from neural_search_ray.index.build import build_index
    from neural_search_ray.query.engine import IndexSearcher

    n = 400
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "text": pa.array([("the " * (10 + i % 5)).strip() for i in range(n)]),
        }
    )
    idx = str(tmp_path / "skew")
    build_index(ray.data.from_arrow(docs), idx, IndexConfig(num_shards=4, num_salts=2))
    s = IndexSearcher(idx)
    assert s.local_df("the") == n
    g = s._gid["the"]
    assert s._gend[g] - s._gstart[g] == 4  # one bounded group per doc shard
    d, sc = s.search_bm25(["the"], k=5)
    assert d.size == 5
    # highest tf (14) + shortest dl wins; all docs have only 'the'
    assert sc[0] == max(sc)


class TestTfvecProperties:
    """Vectorized segmented kernels == scalar reference on random input."""

    @given(
        st.lists(
            st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30),
            min_size=1, max_size=12,
        ),
        st.sampled_from([("top_k", 3), ("max_ratio", 0.5),
                         ("abs_value", 2.0), ("alpha_mass", 0.4)]),
    )
    @settings(max_examples=40, deadline=None)
    def test_prune_stage_matches_scalar(self, docs, strat):
        import pyarrow as pa

        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.stages.prune import prune_sparse_vector
        from neural_search_ray.stages.tfvec import make_prune_tf_stage

        ptype, ratio = strat
        texts = [" ".join(d) for d in docs]
        batch = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        })
        out = make_prune_tf_stage(ptype, ratio)(batch)
        got = sorted(zip(out["doc_id"].to_pylist(), out["term"].to_pylist(),
                         out["tf"].to_pylist()))
        want = []
        for i, t in enumerate(texts):
            vec = {}
            for tok in tokenize(t):
                vec[tok] = vec.get(tok, 0.0) + 1.0
            for k, v in prune_sparse_vector(ptype, ratio, vec).items():
                want.append((i, k, int(v)))
        assert got == sorted(want)

    @given(
        st.lists(st.text(alphabet="ab cd.", min_size=0, max_size=40),
                 min_size=1, max_size=8),
    )
    @settings(max_examples=40, deadline=None)
    def test_tf_rows_match_scalar(self, texts):
        import pyarrow as pa

        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.stages.tfvec import tf_rows_stage

        batch = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        })
        out = tf_rows_stage()(batch)
        got = sorted(zip(out["doc_id"].to_pylist(), out["term"].to_pylist(),
                         out["tf"].to_pylist()))
        want = []
        for i, t in enumerate(texts):
            tf = {}
            for tok in tokenize(t):
                tf[tok] = tf.get(tok, 0) + 1
            want.extend((i, k, v) for k, v in tf.items())
        assert got == sorted(want)

    @given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200))
    @settings(max_examples=30, deadline=None)
    def test_universal_hash_property(self, hs):
        from neural_search_ray.dedup.common import MERSENNE_61, universal_hash

        h = np.asarray(hs, dtype=np.uint64)
        for a, b in [(1610612741, 2971215073), (3, 7)]:
            want = [(a * int(x) + b) % MERSENNE_61 for x in h]
            assert universal_hash(h, a, b).tolist() == want
