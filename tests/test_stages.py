"""Unit tests: prune strategies, chunkers, quantizer — mirrored on the
reference's test style (FixedTokenLengthChunkerTests.java:76-160,
PruneUtilsTests)."""

import numpy as np
import pytest

from neural_search_ray.stages.chunkers import (
    chunk_delimiter,
    chunk_fixed_char_length,
    chunk_fixed_token_length,
)
from neural_search_ray.stages.prune import prune_sparse_vector, split_sparse_vector
from neural_search_ray.stages.quantize import (
    byte_quantize,
    feature_decode,
    feature_encode,
)


class TestPrune:
    VEC = {"a": 5.0, "b": 3.0, "c": 2.0, "d": 1.0}

    def test_top_k(self):
        kept, pruned = split_sparse_vector("top_k", 2, self.VEC)
        assert kept == {"a": 5.0, "b": 3.0}
        assert pruned == {"c": 2.0, "d": 1.0}

    def test_top_k_ties_deterministic(self):
        kept, _ = split_sparse_vector("top_k", 1, {"x": 2.0, "a": 2.0})
        assert kept == {"a": 2.0}  # (value desc, token asc)

    def test_max_ratio(self):
        kept, _ = split_sparse_vector("max_ratio", 0.5, self.VEC)
        assert kept == {"a": 5.0, "b": 3.0}  # >= 2.5

    def test_abs_value(self):
        kept, _ = split_sparse_vector("abs_value", 2.0, self.VEC)
        assert kept == {"a": 5.0, "b": 3.0, "c": 2.0}

    def test_alpha_mass(self):
        # total 11; alpha 0.5 → budget 5.5: a(5) kept, a+b=8 > 5.5 → stop
        kept, _ = split_sparse_vector("alpha_mass", 0.5, self.VEC)
        assert kept == {"a": 5.0}

    def test_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            prune_sparse_vector("top_k", 2, {"a": -1.0})

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            prune_sparse_vector("nope", 1, self.VEC)

    def test_empty(self):
        assert split_sparse_vector("top_k", 3, {}) == ({}, {})


class TestChunkers:
    def test_fixed_token_basic(self):
        # reference semantics: cut at token start offsets; trailing gap
        # chars belong to the preceding chunk
        out = chunk_fixed_token_length("a b c d e", token_limit=2)
        assert out == ["a b ", "c d ", "e"]

    def test_fixed_token_overlap(self):
        out = chunk_fixed_token_length("a b c d e f", token_limit=4, overlap_rate=0.5)
        # overlap = 2 → step 2
        assert out == ["a b c d ", "c d e f"]

    def test_fixed_token_first_chunk_from_zero(self):
        out = chunk_fixed_token_length("  x y z", token_limit=2)
        assert out[0].startswith("  x")  # chars before first token included

    def test_fixed_token_empty(self):
        assert chunk_fixed_token_length("", token_limit=2) == []
        assert chunk_fixed_token_length("...", token_limit=2) == []

    def test_fixed_token_validation(self):
        with pytest.raises(ValueError):
            chunk_fixed_token_length("x", token_limit=2, overlap_rate=0.6)
        with pytest.raises(ValueError):
            chunk_fixed_token_length("x", token_limit=0)

    def test_delimiter(self):
        assert chunk_delimiter("a\n\nb\n\nc", "\n\n") == ["a\n\n", "b\n\n", "c"]
        assert chunk_delimiter("a..b", ".") == ["a.", ".", "b"]
        assert chunk_delimiter("abc", "x") == ["abc"]
        assert chunk_delimiter("ab.", ".") == ["ab."]  # no empty tail

    def test_delimiter_validation(self):
        with pytest.raises(ValueError):
            chunk_delimiter("x", "")

    def test_fixed_char(self):
        assert chunk_fixed_char_length("abcdefgh", char_limit=3) == ["abc", "def", "gh"]
        # overlap 1/3 → interval 2
        assert chunk_fixed_char_length("abcdef", char_limit=3, overlap_rate=1 / 3) == [
            "abc", "cde", "ef",
        ]

    def test_fixed_char_tail_merge(self):
        # at most max_chunk_limit chunks total; remainder folds into the LAST
        # (Chunker.checkRunTimeMaxChunkLimit with chunk_string_count == 1)
        out = chunk_fixed_char_length("abcdefgh", char_limit=2, max_chunk_limit=2)
        assert out == ["ab", "cdefgh"]

    def test_max_chunk_limit_token(self):
        out = chunk_fixed_token_length("a b c d e f", token_limit=1, max_chunk_limit=2)
        assert out == ["a ", "b c d e f"]

    def test_max_chunk_limit_delimiter(self):
        out = chunk_delimiter("a.b.c.d", delimiter=".", max_chunk_limit=2)
        assert out == ["a.", "b.c.d"]

    def test_max_chunk_limit_one(self):
        assert chunk_fixed_char_length("abcdef", char_limit=2, max_chunk_limit=1) == ["abcdef"]


class TestQuantize:
    def test_byte_quantize_bounds(self):
        q = byte_quantize(np.array([0.0, 3.0, 1.5, 99.0]), ceiling=3.0)
        assert q.tolist() == [0, 255, 128, 255]

    def test_round_half_up(self):
        # 0.5 boundary: v*255/c = .5 cases round up
        q = byte_quantize(np.array([1.0 * 3 / 255 / 2]), ceiling=3.0)
        assert q.tolist() == [1]

    def test_feature_roundtrip_is_lossy_prefix(self):
        w = np.array([0.5, 1.0, 2.75], dtype=np.float32)
        enc = feature_encode(w)
        dec = feature_decode(enc)
        # top-16-bits approximation: decode <= original, within 1%
        assert (dec <= w + 1e-6).all()
        assert np.allclose(dec, w, rtol=0.01)

    def test_feature_encode_rejects_negative(self):
        with pytest.raises(ValueError):
            feature_encode(np.array([-1.0], dtype=np.float32))


class TestUnflatten:
    def test_dict_roundtrip(self):
        from neural_search_ray.stages.unflatten import flatten_dict, unflatten_dict

        d = {"a.b": 1, "a.c": 2, "x": 3, "a.d.e": 4}
        nested = unflatten_dict(d)
        assert nested == {"a": {"b": 1, "c": 2, "d": {"e": 4}}, "x": 3}
        assert flatten_dict(nested) == d

    def test_batch_roundtrip(self):
        import pyarrow as pa

        from neural_search_ray.stages.unflatten import flatten_batch, unflatten_batch

        t = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "meta.lang": pa.array(["en", "de"]),
            "meta.score": pa.array([0.5, 0.7]),
        })
        nested = unflatten_batch(t)
        assert nested.column_names == ["doc_id", "meta"]
        assert pa.types.is_struct(nested["meta"].type)
        back = flatten_batch(nested)
        assert back.column_names == ["doc_id", "meta.lang", "meta.score"]
        assert back["meta.lang"].to_pylist() == ["en", "de"]
        assert back["meta.score"].to_pylist() == [0.5, 0.7]


class TestRamAccounting:
    def test_track_batch_memory(self):
        import pyarrow as pa

        from neural_search_ray.state.stats import stats, track_batch_memory

        @track_batch_memory("mystage")
        def fn(batch):
            return batch.select(["a"])

        t = pa.table({"a": list(range(100)), "b": ["x" * 10] * 100})
        before = stats.snapshot().get("mystage_bytes_in", 0)
        out = fn(t)
        snap = stats.snapshot()
        assert snap["mystage_bytes_in"] - before == t.nbytes
        assert snap["mystage_bytes_out"] >= out.nbytes
        assert out.column_names == ["a"]


class TestWinnowRoll:
    def test_matches_scalar_reference(self):
        from neural_search_ray.stages.winnow import winnow_roll_batch, winnow_roll_scalar

        texts = [
            "", "x", "a" * 31, "b" * 32, "c" * 33,
            "hello world this is a long document " * 4,
            "ünïcode tèxt with ümläuts over thirty-two codepoints in total!",
            "exactly sixteen!" * 3,
        ]
        got = winnow_roll_batch(texts).tolist()
        assert got == [winnow_roll_scalar(t) for t in texts]

    def test_hypothesis_random_texts(self):
        import string

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from neural_search_ray.stages.winnow import winnow_roll_batch, winnow_roll_scalar

        alphabet = string.ascii_letters + string.digits + " .,!ü漢"

        @settings(max_examples=40, deadline=None)
        @given(st.lists(st.text(alphabet=alphabet, max_size=120), max_size=8))
        def check(texts):
            assert winnow_roll_batch(texts).tolist() == [
                winnow_roll_scalar(t) for t in texts
            ]

        check()

    def test_stride_sensitivity(self):
        # shifting a long doc by one stride keeps some window hashes in
        # common → frequently equal fingerprints for shared content
        from neural_search_ray.stages.winnow import winnow_roll_scalar

        body = "shared content that spans many windows of text " * 8
        a = winnow_roll_scalar(body)
        b = winnow_roll_scalar(("x" * 16) + body)  # prefix of one stride
        assert a == b  # min window survives the stride-aligned shift


class TestBlockwiseTopk:
    """suite.blockwise_topk — per-block k-heads + k-sized driver merge
    (the Lucene per-segment-collector shape used by every k-sized suite
    answer instead of a global sort)."""

    def test_matches_global_sort(self, ray_session):
        import numpy as np
        import ray.data

        from neural_search_ray.pipelines.suite import blockwise_topk

        rng = np.random.RandomState(3)
        rows = [{"id": int(i), "score": float(rng.randint(0, 50))}
                for i in range(500)]
        ds = ray.data.from_items(rows, override_num_blocks=8)
        got = blockwise_topk(ds, ["score", "id"], [True, False], 10)
        exp = sorted(rows, key=lambda r: (-r["score"], r["id"]))[:10]
        assert [(r["id"], r["score"]) for r in got] == [
            (r["id"], r["score"]) for r in exp
        ]

    def test_k_larger_than_input_and_empty(self, ray_session):
        import ray.data

        from neural_search_ray.pipelines.suite import blockwise_topk

        rows = [{"id": 1, "v": 2.0}, {"id": 2, "v": 1.0}]
        ds = ray.data.from_items(rows, override_num_blocks=2)
        got = blockwise_topk(ds, ["v"], [True], 10)
        assert [r["id"] for r in got] == [1, 2]
        empty = ds.filter(lambda r: r["id"] > 99)
        assert blockwise_topk(empty, ["v"], [True], 5) == []
