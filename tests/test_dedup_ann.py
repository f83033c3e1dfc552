"""Unit tests: dedup operators, ANN (brute + IVF recall), corpus
determinism + extraction invariant."""

import numpy as np
import pyarrow as pa
import pytest

from neural_search_ray.dedup.common import h64, word_shingles
from neural_search_ray.dedup.minhash import MinHasher
from neural_search_ray.dedup.ngram import ngram_jaccard
from neural_search_ray.dedup.simhash import simhash32


class TestDedupPrimitives:
    def test_h64_matches_duckdb(self):
        import duckdb

        con = duckdb.connect()
        for s in ["abc", "hello world", ""]:
            want = con.sql(f"select md5_number_lower('{s}')").fetchone()[0]
            assert h64(s) == want, s

    def test_shingles(self):
        assert word_shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert word_shingles(["a"], 3) == ["a"]
        assert word_shingles([], 3) == []

    def test_minhash_similar_docs_collide_more(self):
        mh = MinHasher(num_hashes=8, shingle_size=3)
        a = "the quick brown fox jumps over the lazy dog again and again"
        b = "the quick brown fox jumps over the lazy dog again and again today"
        c = "completely different words entirely unrelated content here now"
        sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
        sim_ab = sum(x == y for x, y in zip(sa, sb))
        sim_ac = sum(x == y for x, y in zip(sa, sc))
        assert sim_ab > sim_ac

    def test_minhash_identical(self):
        mh = MinHasher()
        assert mh.signature("x y z w v") == mh.signature("x y z w v")

    def test_simhash_hamming(self):
        a = simhash32("the quick brown fox jumps over the lazy dog")
        b = simhash32("the quick brown fox jumps over the lazy cat")
        c = simhash32("totally unrelated text about databases and queries")
        ham = lambda x, y: bin(x ^ y).count("1")  # noqa: E731
        assert ham(a, b) < ham(a, c)
        assert simhash32("") == 0

    def test_ngram_jaccard(self):
        assert ngram_jaccard("a b c", "a b c", 2) == 1.0
        assert ngram_jaccard("a b c", "x y z", 2) == 0.0
        assert ngram_jaccard("", "", 2) == 0.0


class TestANN:
    def test_ivf_recall_vs_brute(self):
        rng = np.random.RandomState(7)
        vecs = rng.randn(500, 32).astype(np.float64)
        ids = np.arange(500, dtype=np.int64)
        from neural_search_ray.ann.ivf import IVFIndex

        idx = IVFIndex(n_centroids=16, nprobe=6).fit(vecs, ids)
        # brute-force reference
        unit = vecs / np.linalg.norm(vecs, axis=1)[:, None]
        recalls = []
        for qi in range(20):
            q = vecs[qi]
            sims = unit @ (q / np.linalg.norm(q))
            brute = set(np.argsort(-sims)[:10].tolist())
            got, _ = idx.search(q, k=10)
            recalls.append(len(brute & set(got.tolist())) / 10)
        assert np.mean(recalls) >= 0.6  # approximate by design

    def test_ivf_deterministic(self):
        rng = np.random.RandomState(7)
        vecs = rng.randn(200, 16)
        ids = np.arange(200, dtype=np.int64)
        from neural_search_ray.ann.ivf import IVFIndex

        a = IVFIndex(seed=42).fit(vecs, ids).search(vecs[0], 5)[0]
        b = IVFIndex(seed=42).fit(vecs, ids).search(vecs[0], 5)[0]
        assert a.tolist() == b.tolist()


class TestCorpus:
    def test_generation_batch_invariant(self):
        from neural_search_ray.corpus.generator import _gen_batch

        whole = _gen_batch(pa.table({"id": list(range(64))}), 42)
        parts = pa.concat_tables(
            [
                _gen_batch(pa.table({"id": list(range(0, 17))}), 42),
                _gen_batch(pa.table({"id": list(range(17, 64))}), 42),
            ]
        )
        assert whole.equals(parts.combine_chunks()) or whole.to_pylist() == parts.to_pylist()

    def test_extract_inverse_and_invariant(self):
        from neural_search_ray.corpus.extract import (
            extract_text,
            extract_text_stage,
            html_of,
        )
        from neural_search_ray.corpus.generator import _gen_batch

        t = _gen_batch(pa.table({"id": list(range(32))}), 7)
        out = extract_text_stage(t)
        assert out["text"].to_pylist() == t["text"].to_pylist()
        assert "html" not in out.column_names
        # corrupt one text → invariant must fail loudly
        bad = t.set_column(
            t.schema.get_field_index("text"), "text",
            pa.array(["CORRUPTED"] + t["text"].to_pylist()[1:]),
        )
        with pytest.raises(ValueError, match="mismatch"):
            extract_text_stage(bad)
        # escape/unescape round-trip with entities
        h = html_of("u", "x & y < z")
        assert extract_text(h) == "x & y < z"

    def test_analyzer_fast_path_equals_slow(self):
        from neural_search_ray.analysis.analyzer import (
            _analyze_column_slow,
            analyze_column,
        )
        from neural_search_ray.config import AnalyzerConfig

        texts = [
            "simple lower text",
            "MIXED Case Words",
            "don't stop example.com",   # forces slow path
            "",
            "a  b",                      # double space
            "числа unicode текст",       # non-ascii → slow path
        ]
        col = pa.array(texts, type=pa.string())
        cfg = AnalyzerConfig()
        fast = analyze_column(col, cfg).to_pylist()
        slow = _analyze_column_slow(col, cfg).to_pylist()
        assert fast == slow
