"""Positional postings (IndexConfig.index_positions), phrase queries
(engine search_phrase — Lucene PhraseQuery slop=0 under BM25Similarity),
term-dictionary expansion (search_prefix / search_wildcard — Lucene
MultiTermQuery CONSTANT_SCORE rewrite), and upsert_docs (Lucene
IndexWriter.updateDocument: delete-by-id + purge + new segment)."""

import os
import re
import shutil
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import IndexConfig
from neural_search_ray.index.build import build_index, index_config_from_manifest
from neural_search_ray.index.codec import (
    posting_gather,
    positions_delta,
    positions_undelta,
)
from neural_search_ray.index.deletes import delete_docs, upsert_docs
from neural_search_ray.index.manifest import IndexManifest
from neural_search_ray.index.merge import merge_segments
from neural_search_ray.query.engine import IndexSearcher

POS_CFG = IndexConfig(num_shards=4, num_salts=2, index_positions=True)
PHRASES = ["data query", "merge sort", "table scan filter", "the the"]


def _docs_ds(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _corpus(sf_dir) -> dict[int, list[str]]:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {
        int(d): tokenize(x)
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


def _ref_positions(corpus, term):
    """Reference (doc -> positions) map via plain Python scan."""
    out = {}
    for d, toks in corpus.items():
        ps = [i for i, t in enumerate(toks) if t == term]
        if ps:
            out[d] = ps
    return out


def _ref_phrase_tf(toks: list[str], phrase: list[str]) -> int:
    n = len(phrase)
    return sum(
        1 for i in range(len(toks) - n + 1) if toks[i : i + n] == phrase
    )


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory, sf_dir, ray_session):
    index_dir = str(tmp_path_factory.mktemp("pos_idx"))
    build_index(_docs_ds(sf_dir), index_dir, POS_CFG)
    return index_dir


@pytest.fixture(scope="module")
def corpus(sf_dir):
    return _corpus(sf_dir)


# ---------------------------------------------------------------------------
# codec kernels


class TestPositionKernels:
    def test_delta_roundtrip(self):
        rng = np.random.default_rng(7)
        tf = rng.integers(1, 9, size=50)
        starts = np.cumsum(tf) - tf
        pos = np.concatenate(
            [np.sort(rng.choice(200, size=n, replace=False)) for n in tf]
        ).astype(np.int64)
        d = positions_delta(pos, starts)
        # first position of each posting is absolute
        assert np.array_equal(d[starts], pos[starts])
        back = positions_undelta(d, starts, tf)
        assert np.array_equal(back, pos)

    def test_delta_empty(self):
        e = np.empty(0, np.int64)
        assert positions_delta(e, e).size == 0
        assert positions_undelta(e, e, e).size == 0

    def test_posting_gather_permutation(self):
        tf = np.array([2, 1, 3], dtype=np.int64)
        starts = np.cumsum(tf) - tf
        flat = np.array([10, 11, 20, 30, 31, 32], dtype=np.int64)
        order = np.array([2, 0, 1])
        g = posting_gather(starts, tf, order)
        assert np.array_equal(flat[g], [30, 31, 32, 10, 11, 20])

    def test_posting_gather_subset(self):
        tf = np.array([2, 1, 3], dtype=np.int64)
        starts = np.cumsum(tf) - tf
        flat = np.array([10, 11, 20, 30, 31, 32], dtype=np.int64)
        g = posting_gather(starts, tf, np.array([0, 2]))
        assert np.array_equal(flat[g], [10, 11, 30, 31, 32])
        assert posting_gather(starts, tf, np.empty(0, np.int64)).size == 0


# ---------------------------------------------------------------------------
# positional build + decode


class TestPositionalIndex:
    def test_positions_match_reference(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        assert s.has_positions
        for term in ["data", "query", "the", "scan"]:
            ref = _ref_positions(corpus, term)
            docs, tfs, posf, tok = s.postings_positions(term)
            assert docs.size == len(ref)
            for i, d in enumerate(docs.tolist()):
                got = posf[tok[i] : tok[i] + tfs[i]].tolist()
                assert got == ref[d], (term, d)

    def test_tf_unchanged_vs_nonpositional(self, pos_index, sf_dir, tmp_path):
        base = str(tmp_path / "plain")
        build_index(
            _docs_ds(sf_dir), base, IndexConfig(num_shards=4, num_salts=2)
        )
        sp = IndexSearcher(pos_index)
        sb = IndexSearcher(base)
        for term in ["data", "query", "sort"]:
            dp, fp = sp.postings(term)
            db, fb = sb.postings(term)
            assert np.array_equal(dp, db) and np.array_equal(fp, fb)
        # BM25 is codec/positions-invariant
        d1, s1 = sp.search_bm25(["data", "query"], k=15)
        d2, s2 = sb.search_bm25(["data", "query"], k=15)
        assert np.array_equal(d1, d2)
        np.testing.assert_allclose(s1, s2, rtol=1e-12)

    def test_positions_require_flag(self, sf_dir, tmp_path):
        base = str(tmp_path / "plain2")
        build_index(
            _docs_ds(sf_dir), base, IndexConfig(num_shards=2, num_salts=1)
        )
        s = IndexSearcher(base)
        with pytest.raises(ValueError, match="without positions"):
            s.postings_positions("data")

    def test_u8_quantization_incompatible(self, sf_dir, tmp_path):
        with pytest.raises(ValueError, match="incompatible"):
            build_index(
                _docs_ds(sf_dir),
                str(tmp_path / "x"),
                IndexConfig(index_positions=True, weight_quantization="u8"),
            )

    def test_mixed_manifest_rejected(self, pos_index, sf_dir):
        with pytest.raises(ValueError, match="index_positions"):
            build_index(
                _docs_ds(sf_dir),
                pos_index,
                IndexConfig(num_shards=4, num_salts=2, index_positions=False),
                segment_id="seg-mixed",
            )


# ---------------------------------------------------------------------------
# phrase search


class TestPhraseSearch:
    def _ref_topk(self, corpus, s, phrase, k):
        ph = tokenize(phrase)
        from neural_search_ray.query.bm25 import bm25_idf

        dfs = np.array(
            [max(s.local_df(t), 1e-9) for t in ph], dtype=np.float64
        )
        idf_sum = float(bm25_idf(dfs, s.n_docs).sum())
        hits = []
        for d, toks in corpus.items():
            tf = _ref_phrase_tf(toks, ph)
            if tf:
                dl = float(len(toks))
                k1, b = s.bm25.k1, s.bm25.b
                hits.append(
                    (
                        -idf_sum * tf / (tf + k1 * (1 - b + b * dl / s.avgdl)),
                        d,
                    )
                )
        hits.sort()
        return [d for _, d in hits[:k]], [-sc for sc, _ in hits[:k]]

    def test_phrase_matches_bruteforce(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        for phrase in PHRASES:
            docs, scores = s.search_phrase(tokenize(phrase), k=12)
            rdocs, rscores = self._ref_topk(corpus, s, phrase, 12)
            assert docs.tolist() == rdocs, phrase
            np.testing.assert_allclose(scores, rscores, rtol=1e-10)

    def test_overlapping_occurrences_count(self, tmp_path, ray_session):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": [0, 1, 2],
                    "text": ["a a a a b", "a a b c d", "b c d e f"],
                }
            )
        )
        idx = str(tmp_path / "ovl")
        build_index(ds, idx, IndexConfig(num_shards=2, num_salts=1, index_positions=True))
        s = IndexSearcher(idx)
        docs, tfs, posf, tok = s.postings_positions("a")
        # doc 0 phrase "a a": positions 0,1,2 start a match (overlap counts)
        d, sc = s.search_phrase(["a", "a"], k=10)
        assert set(d.tolist()) == {0, 1}
        tf = {int(dd): None for dd in d}
        # recompute tfs from scores' monotonicity: doc 0 (tf=3, dl=5)
        # must outrank doc 1 (tf=1, dl=5)
        assert d.tolist()[0] == 0

    def test_phrase_empty_and_missing(self, pos_index):
        s = IndexSearcher(pos_index)
        d, sc = s.search_phrase([], k=5)
        assert d.size == 0
        d, sc = s.search_phrase(["zzzznotaterm", "data"], k=5)
        assert d.size == 0

    def test_phrase_excludes_deleted(self, sf_dir, tmp_path, corpus):
        idx = str(tmp_path / "posdel")
        build_index(_docs_ds(sf_dir), idx, POS_CFG)
        s0 = IndexSearcher(idx)
        docs0, _ = s0.search_phrase(["data", "query"], k=5)
        assert docs0.size > 0
        victim = int(docs0[0])
        delete_docs(idx, [victim])
        s1 = IndexSearcher(idx)
        docs1, _ = s1.search_phrase(["data", "query"], k=5)
        assert victim not in docs1.tolist()


# ---------------------------------------------------------------------------
# merge preserves positions


class TestMergePositions:
    def test_merged_phrase_identical(self, sf_dir, tmp_path, ray_session):
        two = str(tmp_path / "two")

        def _half(r):
            def fn(batch: pa.Table) -> pa.Table:
                ids = batch["doc_id"].to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % 2 == r))

            return fn

        build_index(
            _docs_ds(sf_dir).map_batches(_half(0), batch_format="pyarrow"),
            two, POS_CFG, segment_id="seg-a",
        )
        build_index(
            _docs_ds(sf_dir).map_batches(_half(1), batch_format="pyarrow"),
            two, POS_CFG, segment_id="seg-b",
        )
        pre = IndexSearcher(two)
        want = {
            p: pre.search_phrase(tokenize(p), k=10) for p in PHRASES[:3]
        }
        merge_segments(two, "seg-m", source_ids=["seg-a", "seg-b"])
        post = IndexSearcher(two)
        assert set(IndexManifest.load(two).segments) == {"seg-m"}
        for p, (wd, ws) in want.items():
            gd, gs = post.search_phrase(tokenize(p), k=10)
            assert gd.tolist() == wd.tolist()
            np.testing.assert_allclose(gs, ws, rtol=1e-12)


# ---------------------------------------------------------------------------
# prefix / wildcard


class TestDictionaryExpansion:
    def test_prefix_expansion_matches_scan(self, pos_index):
        s = IndexSearcher(pos_index)
        allterms = [str(t) for t in s._gterms]
        for p in ["qu", "da", "z", ""]:
            want = [t for t in allterms if t.startswith(p)]
            assert s.expand_prefix(p) == want

    def test_prefix_constant_score(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        docs, scores = s.search_prefix("qu", k=15)
        want = sorted(
            d
            for d, toks in corpus.items()
            if any(t.startswith("qu") for t in toks)
        )[:15]
        assert docs.tolist() == want
        assert np.all(scores == 1.0)

    def test_prefix_max_expansions(self, pos_index):
        s = IndexSearcher(pos_index)
        with pytest.raises(ValueError, match="max_expansions"):
            s.search_prefix("", k=5, max_expansions=3)

    def test_wildcard_matches_regex_scan(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        for pat in ["s*m", "*ow", "b?g", "da??"]:
            import fnmatch

            rx = re.compile(fnmatch.translate(pat))
            want = sorted(
                d
                for d, toks in corpus.items()
                if any(rx.match(t) for t in toks)
            )[:10]
            docs, scores = s.search_wildcard(pat, k=10)
            assert docs.tolist() == want, pat
            assert np.all(scores == 1.0)

    def test_wildcard_no_match(self, pos_index):
        s = IndexSearcher(pos_index)
        d, sc = s.search_wildcard("zzzz*qqq", k=5)
        assert d.size == 0


# ---------------------------------------------------------------------------
# upsert


class TestUpsert:
    def test_upsert_matches_fresh_build(self, sf_dir, tmp_path, ray_session):
        idx = str(tmp_path / "ups")
        cfg = IndexConfig(num_shards=4, num_salts=2)
        build_index(_docs_ds(sf_dir), idx, cfg)

        def _upd(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            sel = batch.filter(pa.array(ids % 11 == 0))
            import pyarrow.compute as pc

            text = pc.binary_join_element_wise(
                pa.array(["fresh update "] * len(sel)), sel["text"], ""
            )
            return pa.table({"doc_id": sel["doc_id"], "text": text})

        updated = _docs_ds(sf_dir).map_batches(_upd, batch_format="pyarrow")
        upsert_docs(idx, updated, segment_id="seg-up")

        fresh = str(tmp_path / "fresh")

        def _whole(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            pre = pa.array(
                np.where(ids % 11 == 0, "fresh update ", "").tolist()
            )
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "text": pc.binary_join_element_wise(pre, batch["text"], ""),
                }
            )

        build_index(
            _docs_ds(sf_dir).map_batches(_whole, batch_format="pyarrow"),
            fresh,
            cfg,
        )
        su, sf_ = IndexSearcher(idx), IndexSearcher(fresh)
        assert su.n_docs == sf_.n_docs
        for q in ["fresh update", "data query", "merge sort window"]:
            du, scu = su.search_bm25(tokenize(q), k=20)
            df_, scf = sf_.search_bm25(tokenize(q), k=20)
            assert du.tolist() == df_.tolist(), q
            np.testing.assert_allclose(scu, scf, rtol=1e-12)

    def test_upsert_resume_noop(self, sf_dir, tmp_path, ray_session):
        idx = str(tmp_path / "ups2")
        build_index(_docs_ds(sf_dir), idx, IndexConfig(num_shards=2, num_salts=1))
        small = ray.data.from_arrow(
            pa.table({"doc_id": [3, 7], "text": ["alpha beta", "beta gamma"]})
        )
        m1 = upsert_docs(idx, small, segment_id="seg-u")
        # second call with same segment_id: resume no-op, manifest unchanged
        m2 = upsert_docs(idx, small, segment_id="seg-u")
        assert set(m1.segments) == set(m2.segments)
        s = IndexSearcher(idx)
        d, _ = s.search_bm25(["alpha"], k=5)
        assert 3 in d.tolist()

    def test_upsert_config_roundtrip(self, sf_dir, tmp_path, ray_session):
        idx = str(tmp_path / "ups3")
        cfg = IndexConfig(
            num_shards=4, num_salts=2, posting_codec="for",
            index_positions=True,
        )
        build_index(_docs_ds(sf_dir), idx, cfg)
        m = IndexManifest.load(idx)
        rc = index_config_from_manifest(m)
        assert rc.num_shards == cfg.num_shards
        assert rc.num_salts == cfg.num_salts
        assert rc.posting_codec == "for"
        assert rc.index_positions is True
        assert rc.bm25.k1 == cfg.bm25.k1
        assert rc.analyzer == cfg.analyzer

    def test_upsert_missing_index(self, tmp_path):
        ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
        with pytest.raises(FileNotFoundError):
            upsert_docs(str(tmp_path / "nope"), ds, segment_id="s")


class TestHighlightBestWindow:
    def test_matches_bruteforce(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        W = 6
        for qtext in ["data query", "the fast join", "merge sort window"]:
            terms = sorted(set(tokenize(qtext)))
            want_docs = sorted(
                d for d, toks in corpus.items() if set(toks) & set(terms)
            )[:20]
            hd, hw, hh = s.highlight_best_window(
                terms, np.asarray(want_docs, np.int64), window=W
            )
            got = {int(d): (int(w), int(h)) for d, w, h in zip(hd, hw, hh)}
            for d in want_docs:
                toks = corpus[d]
                pos = [i for i, t in enumerate(toks) if t in terms]
                assert pos, d
                best = max(
                    ((sum(1 for p2 in pos if p <= p2 < p + W), -p) for p in pos),
                )
                assert got[d] == (-best[1], best[0])

    def test_no_match_and_empty(self, pos_index):
        s = IndexSearcher(pos_index)
        d, w, h = s.highlight_best_window(
            ["zzzznoterm"], np.asarray([0, 1], np.int64)
        )
        assert d.size == 0
        d, w, h = s.highlight_best_window(["data"], np.empty(0, np.int64))
        assert d.size == 0

    def test_window_one_counts_single(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        terms = ["data"]
        docs = [d for d, toks in corpus.items() if "data" in toks][:5]
        hd, hw, hh = s.highlight_best_window(
            terms, np.asarray(docs, np.int64), window=1
        )
        assert (hh == 1).all()  # a 1-token window holds exactly one hit
        for d, w in zip(hd, hw):
            assert corpus[int(d)][int(w)] == "data"

    def test_distributed_parity(self, pos_index, ray_session):
        from neural_search_ray.query.distributed import DistributedSearcher

        s = IndexSearcher(pos_index)
        d = DistributedSearcher(pos_index, num_actors=2)
        terms = sorted(set(tokenize("data query")))
        docs, _ = s.search_bm25(terms, k=10)
        a = s.highlight_best_window(terms, docs, window=8)
        b = d.highlight_best_window(terms, docs, window=8)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        d.shutdown()


class TestSpanContainers:
    """span_within / span_containing vs a brute-force token-list replay."""

    @staticmethod
    def _phrase_starts(toks, big):
        L = len(big)
        return [
            i
            for i in range(len(toks) - L + 1)
            if toks[i : i + L] == big
        ]

    def test_within_matches_bruteforce(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        for little, big in [
            ("data", ["data", "query"]),
            ("sort", ["merge", "sort"]),
            ("the", ["the", "fast"]),
        ]:
            want = {}
            for d, toks in corpus.items():
                starts = self._phrase_starts(toks, big)
                tf = sum(
                    1
                    for p, t in enumerate(toks)
                    if t == little
                    and any(q <= p <= q + len(big) - 1 for q in starts)
                )
                if tf:
                    want[d] = tf
            docs, scores = s.search_span_within(little, big, k=10**6)
            got_tf = dict(zip(docs.tolist(), scores.tolist()))
            assert set(got_tf) == set(want), (little, big)
            # scores monotone in tf for same dl is complex; check tf via
            # score formula inversion is overkill — check count parity
            # through a second call with k and ordering determinism
            d2, s2 = s.search_span_within(little, big, k=10**6)
            assert d2.tolist() == docs.tolist()
            np.testing.assert_array_equal(s2, scores)

    def test_containing_matches_bruteforce(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        for little, big in [
            ("data", ["data", "query"]),
            ("scan", ["table", "scan", "filter"]),
        ]:
            want = set()
            for d, toks in corpus.items():
                for q in self._phrase_starts(toks, big):
                    if little in toks[q : q + len(big)]:
                        want.add(d)
                        break
            docs, _ = s.search_span_containing(little, big, k=10**6)
            assert set(docs.tolist()) == want, (little, big)

    def test_within_subset_of_term_matches(self, pos_index):
        s = IndexSearcher(pos_index)
        wd, _ = s.search_span_within("data", ["data", "query"], k=10**6)
        td, _ = s.search_bm25(["data"], k=10**6, pruning="none")
        assert set(wd.tolist()) <= set(td.tolist())

    def test_empty_cases(self, pos_index):
        s = IndexSearcher(pos_index)
        d, _ = s.search_span_within("zzznope", ["data", "query"], k=5)
        assert d.size == 0
        d, _ = s.search_span_containing("data", ["zzznope", "query"], k=5)
        assert d.size == 0
        d, _ = s.search_span_within("data", [], k=5)
        assert d.size == 0


class TestDistributedSpanContainers:
    def test_identical_to_single(self, pos_index, ray_session):
        from neural_search_ray.query.distributed import DistributedSearcher

        s = IndexSearcher(pos_index)
        d = DistributedSearcher(pos_index, num_actors=2)
        try:
            for little, big in [
                ("data", ["data", "query"]),
                ("scan", ["table", "scan", "filter"]),
            ]:
                sd, ss = s.search_span_within(little, big, k=12)
                dd, ds_ = d.search_span_within(little, big, k=12)
                assert dd.tolist() == sd.tolist(), (little, big)
                np.testing.assert_allclose(ds_, ss, rtol=1e-15)
                sd, ss = s.search_span_containing(little, big, k=12)
                dd, ds_ = d.search_span_containing(little, big, k=12)
                assert dd.tolist() == sd.tolist(), (little, big)
                np.testing.assert_allclose(ds_, ss, rtol=1e-15)
        finally:
            d.shutdown()


class TestTermsEnum:
    def test_matches_dictionary(self, pos_index, corpus):
        s = IndexSearcher(pos_index)
        vocab = sorted({t for toks in corpus.values() for t in toks})
        for prefix in ("qu", "s", "zz"):
            want = [t for t in vocab if t.startswith(prefix)][:10]
            terms, dfs = s.terms_enum(prefix, size=10)
            assert terms == want, prefix
            for t, d in zip(terms, dfs.tolist()):
                assert d == sum(
                    1 for toks in corpus.values() if t in toks
                ), t

    def test_min_df_and_validation(self, pos_index):
        s = IndexSearcher(pos_index)
        t_all, d_all = s.terms_enum("s", size=100, min_df=1)
        t_hi, d_hi = s.terms_enum("s", size=100, min_df=50)
        assert set(t_hi) <= set(t_all)
        assert (d_hi >= 50).all()
        with pytest.raises(ValueError):
            s.terms_enum("s", size=0)

    def test_distributed_identical(self, pos_index, ray_session):
        from neural_search_ray.query.distributed import DistributedSearcher

        s = IndexSearcher(pos_index)
        d = DistributedSearcher(pos_index, num_actors=2)
        try:
            for prefix in ("qu", "s", "w"):
                st, sd_ = s.terms_enum(prefix, size=10)
                dt, dd = d.terms_enum(prefix, size=10)
                assert dt == st and dd.tolist() == sd_.tolist(), prefix
        finally:
            d.shutdown()


class TestSpanMulti:
    """engine search_span_multi — SpanNear over term +
    SpanMultiTermQueryWrapper(prefix) legs."""

    def _ref(self, corpus, t0, pfx, slop):
        """Greedy in-order reference over raw token lists + blended idf."""
        import math

        tf = {}
        df0 = dfu = 0
        n_docs = len(corpus)
        dls = {}
        for did, toks in corpus.items():
            dls[did] = len(toks)
            if t0 in toks:
                df0 += 1
            if any(w.startswith(pfx) for w in toks):
                dfu += 1
            cnt = 0
            for i, w in enumerate(toks):
                if w != t0:
                    continue
                if any(
                    toks[j].startswith(pfx)
                    for j in range(i + 1, min(i + slop + 2, len(toks)))
                ):
                    cnt += 1
            if cnt:
                tf[did] = cnt
        if not df0 or not dfu:
            return {}
        idf = sum(
            math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)) for d in (df0, dfu)
        )
        avgdl = sum(dls.values()) / n_docs
        out = {}
        for did, f in tf.items():
            out[did] = idf * f / (f + 1.2 * (1 - 0.75 + 0.75 * dls[did] / avgdl))
        return out

    @pytest.mark.parametrize(
        "t0,pfx,slop",
        [("data", "qu", 1), ("table", "sc", 0), ("big", "w0", 2)],
    )
    def test_matches_reference(self, pos_index, corpus, t0, pfx, slop):
        s = IndexSearcher(pos_index)
        docs, scores = s.search_span_multi(
            [("term", t0), ("prefix", pfx)], k=10**6, slop=slop
        )
        want = self._ref(corpus, t0, pfx, slop)
        assert dict(zip(docs.tolist(), np.round(scores, 9))) == {
            d: float(np.round(v, 9)) for d, v in want.items()
        }

    def test_empty_and_validation(self, pos_index):
        s = IndexSearcher(pos_index)
        d, v = s.search_span_multi([("term", "zzznope"), ("prefix", "qu")], k=5)
        assert d.size == 0
        d, v = s.search_span_multi([("prefix", "zzznope")], k=5)
        assert d.size == 0
        assert s.search_span_multi([], k=5)[0].size == 0
        with pytest.raises(ValueError, match="slop"):
            s.search_span_multi([("term", "data")], slop=-1)
        with pytest.raises(ValueError, match="kind"):
            s.search_span_multi([("wildcard", "d*")], k=5)

    def test_three_leg_chain_hits_contain_pattern(self, pos_index, corpus):
        """A 3-leg chain (term, prefix, term): every hit really holds an
        in-order window data < qu* < scan of width <= 2 + slop."""
        slop = 3
        s = IndexSearcher(pos_index)
        docs, _ = s.search_span_multi(
            [("term", "data"), ("prefix", "qu"), ("term", "scan")],
            k=10**6, slop=slop,
        )

        def has_chain(toks):
            for i, w in enumerate(toks):
                if w != "data":
                    continue
                for j in range(i + 1, len(toks)):
                    if toks[j].startswith("qu"):
                        for m in range(j + 1, len(toks)):
                            if toks[m] == "scan" and m - i <= 2 + slop:
                                return True
                            if m - i > 2 + slop:
                                break
                    if j - i > 1 + slop:
                        break
            return False

        want = {d for d, toks in corpus.items() if has_chain(toks)}
        assert set(docs.tolist()) == want
