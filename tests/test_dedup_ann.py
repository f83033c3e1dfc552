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

    def test_band_keys_mix_matches_scalar_chain(self):
        from neural_search_ray.dedup.minhash import band_keys_mix

        rng = np.random.RandomState(42)
        sig = rng.randint(0, 1 << 61, size=(7, 8)).astype(np.uint64)
        bands, rpb = 4, 2
        got = band_keys_mix(sig, bands)
        # scalar reference: acc = acc*131 + m mod 2^64, seeded 1
        expect = []
        for d in range(sig.shape[0]):
            for b in range(bands):
                acc = 1
                for r in range(rpb):
                    acc = (acc * 131 + int(sig[d, b * rpb + r])) % (1 << 64)
                expect.append(acc)
        assert got.tolist() == expect

    def test_band_keys_mix_distinct_vs_equal(self):
        from neural_search_ray.dedup.minhash import band_keys_mix

        sig = np.array(
            [[1, 2, 3, 4], [1, 2, 3, 4], [1, 2, 9, 4]], dtype=np.uint64
        )
        keys = band_keys_mix(sig, 2).reshape(3, 2)
        assert (keys[0] == keys[1]).all()  # identical sigs → same keys
        assert keys[0][0] == keys[2][0]  # band 0 slice equal
        assert keys[0][1] != keys[2][1]  # band 1 slice differs

    def test_mix_and_md5_keys_yield_same_pairs(self, ray_session):
        import ray.data

        from neural_search_ray.dedup.minhash import minhash_lsh_candidates

        rows = [
            {"doc_id": i, "text": t}
            for i, t in enumerate(
                [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over a sleepy dog",
                    "completely different words entirely unrelated",
                    "another doc about databases queries and indexes",
                    "",
                    "",
                ]
            )
        ]
        ds = ray.data.from_items(rows)
        md5_pairs = sorted(
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(ds, key="md5").take_all()
        )
        mix_pairs = sorted(
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_candidates(ds, key="mix").take_all()
        )
        assert md5_pairs == mix_pairs and len(md5_pairs) > 0


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


class TestDistributedEmbedding:
    """The 100-TB shapes: blocked exact all-pairs (no full broadcast) and
    the IVF-bucketed approximate path / distributed IVF index."""

    def _vec_table(self, n=120, dim=16, seed=3):
        rng = np.random.RandomState(seed)
        base = rng.randn(n, dim)
        # plant near-dups: every 10th vector is a slightly-perturbed copy
        base[5::10] = base[4::10] + 0.01 * rng.randn(len(base[5::10]), dim)
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(base.astype(np.float64)),
                                      type=pa.list_(pa.float64())),
            }
        ), base

    def _brute_pairs(self, mat, threshold):
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        sims = unit @ unit.T
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return {(int(a), int(b)) for a, b in zip(ii, jj)}

    def test_blocked_pairs_exact(self, tmp_path):
        import ray.data

        from neural_search_ray.dedup.embedding import embedding_neardup_pairs

        t, mat = self._vec_table()
        want = self._brute_pairs(mat, 0.9)
        got_rows = embedding_neardup_pairs(
            ray.data.from_arrow(t), str(tmp_path / "blk"), threshold=0.9,
            n_blocks=5,
        ).take_all()
        got = {(r["vec_a"], r["vec_b"]) for r in got_rows}
        assert got == want and len(got_rows) == len(got)  # exact, no dup rows

    def test_block_pair_stage_memory_bounded(self, tmp_path):
        """No stage ever materializes the full vector set: each block file
        holds ~N/B vectors and the pair stage caches at most 3 blocks."""
        import ray.data

        from neural_search_ray.dedup.embedding import (
            BlockPairStage,
            write_vector_blocks,
        )

        t, _ = self._vec_table(n=100)
        paths = write_vector_blocks(
            ray.data.from_arrow(t), str(tmp_path / "blk"), n_blocks=5
        )
        assert len(paths) == 5
        import pyarrow.parquet as pq

        sizes = [pq.read_table(p).num_rows for p in paths]
        assert max(sizes) <= 100 // 5  # hash-partition balance (ids are 0..99)
        stage = BlockPairStage(threshold=0.5)
        for i in range(len(paths)):
            for j in range(i, len(paths)):
                stage(pa.table({"path_a": [paths[i]], "path_b": [paths[j]]}))
                assert len(stage._cache) <= 3

    def test_ivf_bucketed_neardup_recall(self, tmp_path):
        import ray.data

        from neural_search_ray.ann.ivf import fit_centroids
        from neural_search_ray.dedup.embedding import embedding_neardup_ivf

        t, mat = self._vec_table(n=200)
        want = self._brute_pairs(mat, 0.9)
        assert want  # planted dups exist
        cent = fit_centroids(mat, 8, seed=42)
        got_rows = embedding_neardup_ivf(
            ray.data.from_arrow(t), cent, threshold=0.9, nprobe=3
        ).take_all()
        got = {(r["vec_a"], r["vec_b"]) for r in got_rows}
        assert len(got) == len(got_rows)  # multi-probe emissions deduped
        assert got <= self._brute_pairs(mat, 0.9 - 1e-9)  # no false positives
        recall = len(got & want) / len(want)
        assert recall >= 0.8  # approximate by design

    def test_distributed_ivf_exact_at_full_probe(self, tmp_path):
        import ray.data

        from neural_search_ray.ann.ivf import IVFSearcher, build_ivf_index

        t, mat = self._vec_table(n=150)
        build_ivf_index(
            ray.data.from_arrow(t), str(tmp_path / "ivf"), n_centroids=6,
            sample_size=64, seed=42,
        )
        s = IVFSearcher(str(tmp_path / "ivf"))
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        for qi in (0, 7, 33):
            sims = unit @ unit[qi]
            brute = np.lexsort((np.arange(150), -sims))[:10]
            got, got_sims = s.search(mat[qi], k=10, nprobe=6)
            assert got.tolist() == brute.tolist()
            assert np.allclose(got_sims, sims[brute])
            # small-probe result is a subset of the scanned buckets, sorted
            got_small, _ = s.search(mat[qi], k=10, nprobe=2)
            assert len(got_small) <= 10


class TestMinhashRobustness:
    def test_signature_matrix_equals_scalar(self):
        from neural_search_ray.dedup.minhash import MinHasher

        texts = ["the quick brown fox jumps over", "a b", "", "x",
                 "repeat repeat repeat repeat", "one two three"]
        mh = MinHasher(num_hashes=8, shingle_size=3)
        mat = mh.signature_matrix(pa.array(texts))
        for i, t in enumerate(texts):
            assert mat[i].tolist() == mh.signature(t), t

    def test_num_hashes_beyond_eight(self):
        from neural_search_ray.dedup.minhash import MinHasher, coefficients

        a, b = coefficients(20)
        assert len(a) == 20 and len(set(a)) == 20
        assert all(0 < x < (1 << 31) for x in a)
        assert all(0 <= x < (1 << 32) for x in b)
        mh = MinHasher(num_hashes=20)
        sig = mh.signature("the quick brown fox jumps over the lazy dog")
        assert len(sig) == 20
        assert mh.signature_matrix(pa.array(["the quick brown fox jumps over the lazy dog"]))[0].tolist() == sig

    def test_pathological_skew_bucket_cap(self):
        """All-identical docs: every band bucket is degenerate; the cap
        bounds candidate pairs to O(cap^2) instead of O(n^2)."""
        import ray.data

        from neural_search_ray.dedup.minhash import minhash_lsh_candidates

        n = 400
        t = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["same text everywhere forever and ever again"] * n),
        })
        cap = 10
        pairs = minhash_lsh_candidates(
            ray.data.from_arrow(t), num_hashes=8, bands=4, max_bucket=cap
        ).take_all()
        assert 0 < len(pairs) <= cap * (cap - 1) // 2

    def test_universal_hash_matches_python_ints(self):
        from neural_search_ray.dedup.common import MERSENNE_61, universal_hash

        rng = np.random.RandomState(1)
        h = rng.randint(0, 2**62, size=500).astype(np.uint64) * np.uint64(4) + np.uint64(3)
        for a, b in [(1610612741, 2971215073), (12582917, 49979687)]:
            want = [(a * int(x) + b) % MERSENNE_61 for x in h]
            assert universal_hash(h, a, b).tolist() == want


class TestDocValues:
    def test_build_lookup_accepted(self, tmp_path):
        import ray.data

        from neural_search_ray.index.docvalues import DocValues, build_doc_values

        n = 100
        t = pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(["en" if i % 3 else "de" for i in range(n)]),
            "n_chars": pa.array(np.arange(n, dtype=np.int64) * 7),
        })
        build_doc_values(ray.data.from_arrow(t), str(tmp_path), num_shards=4)
        dv = DocValues(str(tmp_path), [0, 1, 2, 3])
        ids = np.array([5, 42, 99])
        assert dv.lookup(ids, "n_chars").to_pylist() == [35, 294, 693]
        acc = dv.accepted("lang", "==", "de")
        assert acc.tolist() == [i for i in range(n) if i % 3 == 0]
        # shard subset sees only its docs
        dv01 = DocValues(str(tmp_path), [0, 1])
        assert set(dv01.accepted("lang", "==", "de")) == {
            i for i in range(n) if i % 3 == 0 and i % 4 in (0, 1)
        }


class TestConnectedComponents:
    def test_chain_clique_pair(self):
        import ray.data

        from neural_search_ray.dedup.components import connected_components

        pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21),
                 (30, 31), (31, 32), (32, 33), (33, 34)]
        t = pa.table({"doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                      "doc_b": pa.array([b for _, b in pairs], pa.int64())})
        got = {r["doc_id"]: r["component"]
               for r in connected_components(ray.data.from_arrow(t)).take_all()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
                       20: 20, 21: 20, 30: 30, 31: 30, 32: 30, 33: 30, 34: 30}

    def test_long_chain_converges(self):
        import ray.data

        from neural_search_ray.dedup.components import connected_components

        n = 8  # diameter 7 — needs multiple propagation rounds
        t = pa.table({"doc_a": pa.array(np.arange(n - 1, dtype=np.int64)),
                      "doc_b": pa.array(np.arange(1, n, dtype=np.int64))})
        got = {r["doc_id"]: r["component"]
               for r in connected_components(ray.data.from_arrow(t), num_buckets=2).take_all()}
        assert got == {i: 0 for i in range(n)}

    def test_local_and_bsp_modes_agree(self):
        """The single-task local path (default for small edge sets) and
        the BSP path (forced via local_threshold=0) must produce the
        same components on a random graph."""
        import ray.data

        from neural_search_ray.dedup.components import connected_components

        rng = np.random.RandomState(5)
        a = rng.randint(0, 200, size=300).astype(np.int64)
        b = rng.randint(0, 200, size=300).astype(np.int64)
        keep = a != b
        t = pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])})
        local = {r["doc_id"]: r["component"]
                 for r in connected_components(ray.data.from_arrow(t)).take_all()}
        bsp = {r["doc_id"]: r["component"]
               for r in connected_components(
                   ray.data.from_arrow(t), local_threshold=0).take_all()}
        assert local == bsp and len(local) > 0

    def test_local_mode_empty_pairs(self):
        import ray.data

        from neural_search_ray.dedup.components import connected_components

        t = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
        assert connected_components(ray.data.from_arrow(t)).take_all() == []


class TestRadial:
    """Radial (min_score / max_distance) dense retrieval — the reference
    neural query's radial variant (query/NeuralQueryBuilder.java:156-157,232)."""

    def _vec_table(self, n=150, dim=16, seed=3):
        rng = np.random.RandomState(seed)
        base = rng.randn(n, dim)
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(base.astype(np.float64)),
                                      type=pa.list_(pa.float64())),
            }
        ), base

    def _naive(self, mat, q, thr):
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        sims = unit @ (q / np.linalg.norm(q))
        keep = np.nonzero(sims >= thr)[0]
        return {int(i): float(sims[i]) for i in keep}

    def test_brute_radial_matches_naive(self, ray_session):
        import ray.data

        from neural_search_ray.ann.brute import radial_search

        t, mat = self._vec_table()
        queries = mat[:3]
        got = radial_search(
            ray.data.from_arrow(t), queries, np.arange(3), min_score=0.4
        )
        for qi in range(3):
            want = self._naive(mat, mat[qi], 0.4)
            m = got["query_id"].to_numpy() == qi
            ids = got["neighbor_id"].to_numpy()[m]
            sims = got["score"].to_numpy()[m]
            assert set(ids.tolist()) == set(want)
            for i, s in zip(ids, sims):
                assert abs(s - want[int(i)]) < 1e-12
            # sorted by score desc, id asc within query
            assert (np.diff(sims) <= 1e-15).all()

    def test_max_distance_equivalent(self, ray_session):
        import ray.data

        from neural_search_ray.ann.brute import radial_search

        t, mat = self._vec_table(n=60)
        a = radial_search(ray.data.from_arrow(t), mat[:2], np.arange(2), min_score=0.3)
        b = radial_search(
            ray.data.from_arrow(t), mat[:2], np.arange(2), max_distance=0.7
        )
        assert a.equals(b)

    def test_exactly_one_threshold_required(self):
        from neural_search_ray.ann.brute import _radial_threshold

        import pytest as _pytest

        with _pytest.raises(ValueError):
            _radial_threshold(None, None)
        with _pytest.raises(ValueError):
            _radial_threshold(0.5, 0.5)

    def test_ivf_radial_exact_on_diffuse_corpus(self, ray_session, tmp_path):
        """Random Gaussian vectors: bucket radii are wide so the bound
        rarely prunes, but the result must STILL be exact."""
        import ray.data

        from neural_search_ray.ann.ivf import IVFSearcher, build_ivf_index

        t, mat = self._vec_table(n=200)
        build_ivf_index(
            ray.data.from_arrow(t), str(tmp_path / "ivf"), n_centroids=8,
            sample_size=128, seed=42,
        )
        s = IVFSearcher(str(tmp_path / "ivf"))
        assert "bucket_mindot" in s.manifest
        for qi in (0, 11, 42, 77):
            thr = 0.45
            want = self._naive(mat, mat[qi], thr)
            ids, sims = s.radial_search(mat[qi], min_score=thr)
            assert set(ids.tolist()) == set(want)
            for i, sv in zip(ids, sims):
                assert abs(sv - want[int(i)]) < 1e-12

    def test_ivf_radial_prunes_clustered_corpus(self, ray_session, tmp_path):
        """Clustered corpus (tight buckets): the spherical bound must
        actually skip far-away buckets AND stay exact."""
        import ray.data

        from neural_search_ray.ann.ivf import IVFSearcher, build_ivf_index

        rng = np.random.RandomState(9)
        n, dim, k = 400, 12, 4
        centers = rng.randn(k, dim) * 5
        mat = np.concatenate(
            [centers[c] + 0.2 * rng.randn(n // k, dim) for c in range(k)]
        )
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mat.astype(np.float64)),
                                      type=pa.list_(pa.float64())),
            }
        )
        build_ivf_index(
            ray.data.from_arrow(t), str(tmp_path / "ivf"), n_centroids=k,
            sample_size=200, seed=42,
        )
        s = IVFSearcher(str(tmp_path / "ivf"))
        pruned_any = False
        for qi in (3, 150, 399):
            thr = 0.8
            want = self._naive(mat, mat[qi], thr)
            ids, sims = s.radial_search(mat[qi], min_score=thr)
            assert set(ids.tolist()) == set(want)
            q = mat[qi] / np.linalg.norm(mat[qi])
            if len(s.radial_buckets(q, thr)) < len(s.manifest["buckets"]):
                pruned_any = True
        assert pruned_any  # the bound actually skips buckets here

    def test_ivf_radial_old_manifest_unpruned_still_exact(self, ray_session, tmp_path):
        import json
        import os

        import ray.data

        from neural_search_ray.ann.ivf import IVFSearcher, build_ivf_index

        t, mat = self._vec_table(n=80)
        build_ivf_index(
            ray.data.from_arrow(t), str(tmp_path / "ivf"), n_centroids=4,
            sample_size=64, seed=42,
        )
        # simulate a round-2 manifest: no bucket_mindot
        mp = os.path.join(str(tmp_path / "ivf"), "ivf_manifest.json")
        with open(mp) as f:
            man = json.load(f)
        man.pop("bucket_mindot")
        with open(mp, "w") as f:
            json.dump(man, f)
        s = IVFSearcher(str(tmp_path / "ivf"))
        want = self._naive(mat, mat[5], 0.4)
        ids, _ = s.radial_search(mat[5], min_score=0.4)
        assert set(ids.tolist()) == set(want)


class TestIVFSampleBalance:
    def test_hash_sample_unbiased_on_sorted_clustered_corpus(self, ray_session, tmp_path):
        """Round-2 bug (VERDICT what's-wrong #1): centroid sample was
        ds.limit(n) — a PREFIX — so an id-ordered corpus whose content
        drifts with id fit centroids on a biased slice. The hash-gated
        sample must produce buckets balanced within a factor bound on
        exactly that corpus shape."""
        import ray.data

        from neural_search_ray.ann.ivf import IVFSearcher, build_ivf_index

        rng = np.random.RandomState(7)
        n, dim, k = 1200, 12, 4
        # id-sorted clustered corpus: first 300 ids cluster 0, next 300
        # cluster 1, ... (a prefix sample sees ONLY cluster 0)
        centers = rng.randn(k, dim) * 4
        mat = np.concatenate(
            [centers[c] + 0.3 * rng.randn(n // k, dim) for c in range(k)]
        )
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mat.astype(np.float64)),
                                      type=pa.list_(pa.float64())),
            }
        )
        build_ivf_index(
            ray.data.from_arrow(t), str(tmp_path / "ivf"), n_centroids=k,
            sample_size=256, seed=42,
        )
        s = IVFSearcher(str(tmp_path / "ivf"))
        sizes = sorted(s.manifest["buckets"].values())
        assert len(sizes) == k  # every centroid got a bucket
        assert sizes[-1] <= 3 * sizes[0], sizes  # balanced within 3x

    def test_sample_deterministic_across_block_layouts(self, ray_session):
        import ray.data

        from neural_search_ray.ann.ivf import _sample_embeddings

        rng = np.random.RandomState(11)
        mat = rng.randn(500, 8)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(500, dtype=np.int64)),
                "embedding": pa.array(list(mat.astype(np.float64)),
                                      type=pa.list_(pa.float64())),
            }
        )
        a = _sample_embeddings(ray.data.from_arrow(t), 100, 42, "vec_id", "embedding")
        b = _sample_embeddings(
            ray.data.from_arrow(t).repartition(7), 100, 42, "vec_id", "embedding"
        )
        assert a.shape == (100, 8)
        assert np.array_equal(np.sort(a, axis=0), np.sort(b, axis=0))


class TestSimhashPairs:
    def test_lsh_equals_bruteforce(self, ray_session):
        import ray.data

        from neural_search_ray.dedup.simhash import (
            _POPCNT8,
            simhash32,
            simhash_lsh_pairs,
        )

        rng = np.random.RandomState(4)
        words = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(60):
            toks = [words[rng.randint(40)] for _ in range(12)]
            texts.append(" ".join(toks))
            if i % 7 == 0:  # plant near-dups: one token swapped
                mut = list(toks)
                mut[0] = words[rng.randint(40)]
                texts.append(" ".join(mut))
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in simhash_lsh_pairs(ray.data.from_arrow(t), max_hamming=3).take_all()
        }
        h = np.array([simhash32(x) for x in texts], dtype=np.uint64)
        ii, jj = np.triu_indices(len(texts), k=1)
        x = h[ii] ^ h[jj]
        ham = (
            _POPCNT8[x & 0xFF] + _POPCNT8[(x >> 8) & 0xFF]
            + _POPCNT8[(x >> 16) & 0xFF] + _POPCNT8[(x >> 24) & 0xFF]
        )
        keep = ham <= 3
        want = {
            (int(a), int(b), int(hm))
            for a, b, hm in zip(ii[keep], jj[keep], ham[keep])
        }
        # pigeonhole (hamming<=3 over 4 bands) → LSH finds EVERY pair
        assert got == want
        assert want  # the planted near-dups actually produced pairs

    def test_max_hamming_bound_validated(self, ray_session):
        import pytest as _pytest
        import ray.data

        from neural_search_ray.dedup.simhash import simhash_lsh_pairs

        t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x"])})
        with _pytest.raises(ValueError, match="pigeonhole"):
            simhash_lsh_pairs(ray.data.from_arrow(t), max_hamming=4)


class TestApplyDedup:
    def test_keep_first_and_unpaired(self, ray_session):
        import ray.data

        from neural_search_ray.dedup.components import apply_dedup

        corpus = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(10, dtype=np.int64))})
        )
        # components: {1,4,7} rep 1, {3,9} rep 3 → drop 4,7,9
        comps = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([1, 4, 7, 3, 9], pa.int64()),
                    "component": pa.array([1, 1, 1, 3, 3], pa.int64()),
                }
            )
        )
        got = sorted(r["doc_id"] for r in apply_dedup(corpus, comps).take_all())
        assert got == [0, 1, 2, 3, 5, 6, 8]
        # join mode (broadcast_threshold=0 forces it) must agree
        got_join = sorted(
            r["doc_id"]
            for r in apply_dedup(corpus, comps, broadcast_threshold=0).take_all()
        )
        assert got_join == got

    def test_empty_components_keeps_all(self, ray_session):
        import ray.data

        from neural_search_ray.dedup.components import apply_dedup

        corpus = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64))})
        )
        comps = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "component": pa.array([], pa.int64())})
        )
        got = sorted(r["doc_id"] for r in apply_dedup(corpus, comps).take_all())
        assert got == [0, 1, 2, 3, 4]


class TestIVFVersioning:
    def test_refuses_future_ivf_version(self, ray_session, tmp_path):
        import json
        import os

        import ray.data

        from neural_search_ray.ann.ivf import IVFSearcher, build_ivf_index
        from neural_search_ray.index.manifest import IndexFormatError

        rng = np.random.RandomState(1)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(40, dtype=np.int64)),
                "embedding": pa.array(list(rng.randn(40, 8)),
                                      type=pa.list_(pa.float64())),
            }
        )
        d = str(tmp_path / "ivf")
        build_ivf_index(ray.data.from_arrow(t), d, n_centroids=4, sample_size=40)
        s = IVFSearcher(d)
        assert s.manifest["format_version"] == 1
        mp = os.path.join(d, "ivf_manifest.json")
        with open(mp) as f:
            m = json.load(f)
        m["format_version"] = 99
        with open(mp, "w") as f:
            json.dump(m, f)
        import pytest as _pytest

        with _pytest.raises(IndexFormatError):
            IVFSearcher(d)


class TestSQ8:
    """Int8 scalar-quantized dense tier (ann/sq8.py): codec semantics,
    streaming trainer, and exact integer-dot top-k."""

    def _vec_table(self, n=120, dim=12, seed=11):
        rng = np.random.RandomState(seed)
        base = rng.randn(n, dim) * rng.uniform(0.2, 5.0, size=dim)
        return pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(base.astype(np.float64)),
                                      type=pa.list_(pa.float64())),
            }
        ), base

    def test_quantize_half_up_and_range(self):
        from neural_search_ray.ann.sq8 import quantize_sq8

        s = np.array([1.0])
        # floor(x*s + 0.5): half rounds toward +inf on both signs
        assert quantize_sq8(np.array([[2.5]]), s)[0, 0] == 3
        assert quantize_sq8(np.array([[-2.5]]), s)[0, 0] == -2
        assert quantize_sq8(np.array([[0.49]]), s)[0, 0] == 0
        # zero scale (all-zero dimension) -> code 0 for any value
        z = np.array([0.0])
        assert quantize_sq8(np.array([[-7.3]]), z)[0, 0] == 0
        # in-domain values stay in [-127, 127]; out-of-domain clipped
        big = np.array([[400.0], [-400.0]])
        out = quantize_sq8(big, np.array([127.0 / 300.0]))
        assert out.max() == 127 and out.min() == -127

    def test_train_scales_streaming(self, ray_session):
        import ray.data

        from neural_search_ray.ann.sq8 import train_sq8_scales

        t, base = self._vec_table()
        got = train_sq8_scales(ray.data.from_arrow(t).repartition(7))
        want = 127.0 / np.abs(base).max(axis=0)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_train_scales_zero_dim(self, ray_session):
        import ray.data

        from neural_search_ray.ann.sq8 import train_sq8_scales

        t, base = self._vec_table(n=20, dim=4)
        base = base.copy()
        base[:, 2] = 0.0
        t = pa.table(
            {
                "vec_id": t["vec_id"],
                "embedding": pa.array(list(base), type=pa.list_(pa.float64())),
            }
        )
        got = train_sq8_scales(ray.data.from_arrow(t))
        assert got[2] == 0.0
        assert (got[[0, 1, 3]] > 0).all()

    def test_knn_sq8_matches_naive(self, ray_session):
        import ray.data

        from neural_search_ray.ann.sq8 import knn_sq8, quantize_sq8, train_sq8_scales

        t, base = self._vec_table()
        ds = ray.data.from_arrow(t).repartition(5)
        scales = train_sq8_scales(ds)
        queries = base[:4]
        got = knn_sq8(ds, queries, np.arange(4), scales, k=8)
        codes = quantize_sq8(base, scales).astype(np.int64)
        qc = quantize_sq8(queries, scales).astype(np.int64)
        sims = qc @ codes.T
        ids = np.arange(base.shape[0], dtype=np.int64)
        for qi in range(4):
            order = np.lexsort((ids, -sims[qi]))[:8]
            m = got["query_id"].to_numpy() == qi
            assert got["neighbor_id"].to_numpy()[m].tolist() == ids[order].tolist()
            assert got["score"].to_numpy()[m].tolist() == sims[qi][order].tolist()
        # scores are exact integers (no float in the scoring path)
        assert got["score"].type == pa.int64()

    def test_knn_sq8_deterministic_across_block_layouts(self, ray_session):
        import ray.data

        from neural_search_ray.ann.sq8 import knn_sq8, train_sq8_scales

        t, base = self._vec_table(n=60)
        a_ds = ray.data.from_arrow(t)
        b_ds = ray.data.from_arrow(t).repartition(9)
        scales = train_sq8_scales(a_ds)
        got_a = knn_sq8(a_ds, base[:3], np.arange(3), scales, k=5)
        got_b = knn_sq8(b_ds, base[:3], np.arange(3), scales, k=5)
        assert got_a.equals(got_b)
