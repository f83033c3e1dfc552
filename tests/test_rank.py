"""Unit tests: normalization formulas, combination techniques, hybrid
fusion, collapse, rerank, two-phase — values hand-computed per the
reference semantics (ScoreNormalizationTechniqueTests style)."""

import numpy as np
import pytest

from neural_search_ray.rank.collapse import collapse_top_docs
from neural_search_ray.rank.combine import (
    combine_arithmetic_mean,
    combine_geometric_mean,
    combine_harmonic_mean,
    combine_rrf,
)
from neural_search_ray.rank.hybrid import hybrid_rank
from neural_search_ray.rank.normalize import (
    norm_l2,
    norm_min_max,
    norm_rrf,
    norm_z_score,
)
from neural_search_ray.rank.rerank import mmr_select, rerank_by_field


class TestNormalize:
    def test_min_max(self):
        out = norm_min_max(np.array([1.0, 2.0, 3.0]))
        assert out.tolist() == [0.001, 0.5, 1.0]  # 0 → MIN_SCORE

    def test_min_max_single(self):
        assert norm_min_max(np.array([7.0])).tolist() == [1.0]
        assert norm_min_max(np.array([7.0, 7.0])).tolist() == [1.0, 1.0]

    def test_l2(self):
        out = norm_l2(np.array([3.0, 4.0]))
        assert np.allclose(out, [0.6, 0.8])
        assert norm_l2(np.array([0.0, 0.0])).tolist() == [0.001, 0.001]

    def test_z_score(self):
        s = np.array([1.0, 2.0, 3.0])
        out = norm_z_score(s)
        # mean=2, SAMPLE std=sqrt(2/2)=1 (Commons-Math n-1 denominator);
        # s==mean → max raw (3.0); below-mean → 0.001
        assert out[1] == 3.0
        assert out[0] == 0.001
        assert out[2] == pytest.approx(1.0)

    def test_z_score_all_equal(self):
        out = norm_z_score(np.array([5.0, 5.0]))
        assert out.tolist() == [5.0, 5.0]  # s == mean branch wins

    def test_rrf(self):
        out = norm_rrf(np.array([9.0, 5.0, 7.0]), np.array([10, 20, 30]))
        assert out[0] == pytest.approx(1 / 61, abs=1e-9)
        assert out[2] == pytest.approx(1 / 62, abs=1e-9)
        assert out[1] == pytest.approx(1 / 63, abs=1e-9)

    def test_rrf_tie_by_doc(self):
        out = norm_rrf(np.array([5.0, 5.0]), np.array([20, 10]))
        assert out[1] > out[0]  # doc 10 ranks first

    def test_rrf_bad_constant(self):
        with pytest.raises(ValueError):
            norm_rrf(np.array([1.0]), rank_constant=0)


class TestCombine:
    M = np.array([[1.0, 3.0], [2.0, np.nan], [np.nan, np.nan]])

    def test_arithmetic(self):
        out = combine_arithmetic_mean(self.M, [0.5, 0.5])
        assert out[0] == pytest.approx(2.0)
        assert out[1] == pytest.approx(2.0)  # single present subquery
        assert out[2] == 0.0

    def test_geometric(self):
        out = combine_geometric_mean(np.array([[4.0, 9.0]]))
        assert out[0] == pytest.approx(6.0)

    def test_geometric_skips_nonpositive(self):
        out = combine_geometric_mean(np.array([[0.0, 9.0]]))
        assert out[0] == pytest.approx(9.0)

    def test_harmonic(self):
        out = combine_harmonic_mean(np.array([[2.0, 6.0]]))
        assert out[0] == pytest.approx(3.0)

    def test_rrf_sum(self):
        out = combine_rrf(np.array([[0.1, 0.2], [0.3, np.nan]]), [1.0, 2.0])
        assert out[0] == pytest.approx(0.5)
        assert out[1] == pytest.approx(0.3)

    def test_weight_mismatch(self):
        with pytest.raises(ValueError):
            combine_arithmetic_mean(self.M, [1.0])


class TestHybrid:
    def test_two_subqueries(self):
        bm = (np.array([1, 2, 3]), np.array([3.0, 2.0, 1.0]))
        dot = (np.array([2, 3, 4]), np.array([10.0, 20.0, 5.0]))
        docs, scores = hybrid_rank([bm, dot], k=4)
        assert set(docs.tolist()) == {1, 2, 3, 4}
        # doc3: bm norm 0.001, dot norm 1.0 → mean ≈ 0.5
        i3 = docs.tolist().index(3)
        assert scores[i3] == pytest.approx((0.001 + 1.0) / 2)

    def test_empty(self):
        docs, scores = hybrid_rank([(np.empty(0, np.int64), np.empty(0))], k=5)
        assert docs.size == 0


class TestCollapseRerank:
    def test_collapse(self):
        docs = np.array([1, 2, 3, 4])
        scores = np.array([9.0, 8.0, 7.0, 6.0])
        langs = np.array(["en", "en", "fr", "fr"])
        d, s, f = collapse_top_docs(docs, scores, langs, docs_per_group=1)
        assert d.tolist() == [1, 3]

    def test_collapse_inner_hits(self):
        from neural_search_ray.rank.collapse import collapse_inner_hits

        docs = np.array([1, 2, 3, 4, 5, 6])
        scores = np.array([9.0, 8.0, 7.0, 6.0, 5.0, 4.0])
        langs = np.array(["en", "en", "fr", "en", "fr", "de"])
        groups = collapse_inner_hits(docs, scores, langs, k=2, inner_size=2)
        # heads: en(doc 1, 9.0) rank 1, fr(doc 3, 7.0) rank 2; de cut by k=2
        assert [(g[0], g[1]) for g in groups] == [("en", 1), ("fr", 2)]
        en, fr = groups
        assert en[2].tolist() == [1, 2]  # head included, top-2 inner
        assert en[3].tolist() == [9.0, 8.0]
        assert fr[2].tolist() == [3, 5]
        # tie on score falls back to doc_id asc, like the collector
        g2 = collapse_inner_hits(
            np.array([7, 6]), np.array([1.0, 1.0]), np.array(["en", "en"]),
            k=1, inner_size=2,
        )
        assert g2[0][2].tolist() == [6, 7]

    def test_rerank_by_field(self):
        d, s, prev = rerank_by_field(
            np.array([1, 2]), np.array([0.9, 0.1]), np.array([10.0, 20.0]),
            keep_previous_score=True,
        )
        assert d.tolist() == [2, 1]
        assert s.tolist() == [20.0, 10.0]
        assert prev.tolist() == [0.1, 0.9]

    def test_mmr_prefers_diversity(self):
        rel = np.array([1.0, 0.99, 0.5])
        vecs = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])  # 0 and 1 identical
        sel = mmr_select(rel, vecs, k=2, lambda_=0.5)
        assert sel.tolist() == [0, 2]  # skips the near-duplicate


class TestExplain:
    def test_hybrid_explain(self):
        bm = (np.array([1, 2]), np.array([3.0, 1.0]))
        dot = (np.array([2, 3]), np.array([10.0, 20.0]))
        docs, scores, exps = hybrid_rank([bm, dot], k=3, explain=True)
        assert len(exps) == docs.size
        e2 = [e for e in exps if e["doc_id"] == 2][0]
        assert e2["subqueries"][0]["raw_score"] == 1.0
        assert e2["subqueries"][1]["raw_score"] == 10.0
        assert e2["normalization"] == "min_max"
        e3 = [e for e in exps if e["doc_id"] == 3][0]
        assert e3["subqueries"][0]["raw_score"] is None  # absent from bm25


class TestMinMaxBounds:
    """Bound-mode matrix vs hand-computed expectations
    (MinMaxScoreNormalizationTechnique.java:260-297 + bounds/*.java)."""

    def _n(self, scores, lower=None, upper=None):
        from neural_search_ray.rank.normalize import norm_min_max_bounded

        return norm_min_max_bounded(np.asarray(scores, dtype=float), lower, upper)

    def test_no_bounds_equals_plain(self):
        s = np.array([1.0, 2.0, 3.0])
        assert self._n(s).tolist() == norm_min_max(s).tolist()

    def test_lower_apply(self):
        # mn=1, mx=3, bound=1.5: scores > 1.5 use emin=1.5, others emin=mn
        out = self._n([1.0, 2.0, 3.0], lower={"mode": "apply", "min_score": 1.5})
        assert out[2] == pytest.approx((3 - 1.5) / (3 - 1.5))  # = 1.0
        assert out[1] == pytest.approx((2 - 1.5) / (3 - 1.5))
        assert out[0] == pytest.approx(0.001)  # (1-1)/(3-1) = 0 → MIN_SCORE

    def test_lower_apply_bound_above_max_ignored(self):
        out = self._n([1.0, 3.0], lower={"mode": "apply", "min_score": 5.0})
        assert out.tolist() == [0.001, 1.0]  # emin stays mn

    def test_lower_clip(self):
        # bound=1.5 <= mx → emin=1.5 for all; scores < 1.5 clip to 0.001
        out = self._n([1.0, 2.0, 3.0], lower={"mode": "clip", "min_score": 1.5})
        assert out[0] == 0.001
        assert out[1] == pytest.approx((2 - 1.5) / (3 - 1.5))
        assert out[2] == pytest.approx(1.0)

    def test_lower_clip_bound_above_max(self):
        # mx < bound → emin falls back to mn (no clipping)
        out = self._n([1.0, 2.0], lower={"mode": "clip", "min_score": 9.0})
        assert out.tolist() == [0.001, 1.0]

    def test_upper_apply(self):
        # mn=1, mx=3, bound=2.5: scores < 2.5 use emax=2.5
        out = self._n([1.0, 2.0, 3.0], upper={"mode": "apply", "max_score": 2.5})
        assert out[0] == 0.001
        assert out[1] == pytest.approx((2 - 1) / (2.5 - 1))
        assert out[2] == pytest.approx(1.0)  # score >= bound → emax=mx

    def test_upper_clip(self):
        # bound=2.5 >= mn → emax=2.5; scores above clip to 1.0
        out = self._n([1.0, 2.0, 3.0], upper={"mode": "clip", "max_score": 2.5})
        assert out[2] == 1.0
        assert out[1] == pytest.approx((2 - 1) / (2.5 - 1))

    def test_ignore_modes(self):
        s = np.array([1.0, 2.0, 3.0])
        out = self._n(s, lower={"mode": "ignore", "min_score": 1.5},
                      upper={"mode": "ignore", "max_score": 2.5})
        assert out.tolist() == norm_min_max(s).tolist()

    def test_single_score_edge(self):
        assert self._n([7.0, 7.0], lower={"mode": "clip", "min_score": 8.0}).tolist() == [1.0, 1.0]

    def test_hybrid_bounds_mismatch_raises(self):
        from neural_search_ray.rank.hybrid import hybrid_rank

        subs = [(np.array([1, 2]), np.array([0.5, 0.2]))]
        with pytest.raises(ValueError, match="mismatch"):
            hybrid_rank(subs, lower_bounds=[{"mode": "apply"}, {"mode": "apply"}])


class TestSearchAfter:
    def test_keyset_pages_partition_exactly(self):
        import ray.data

        from neural_search_ray.rank.paging import search_after

        rng = np.random.RandomState(5)
        n = 500
        t = {"id": np.arange(n, dtype=np.int64),
             "v": rng.randint(0, 50, n).astype(np.float64)}  # many ties
        import pyarrow as pa

        tab = pa.table(t)
        keys = [("v", "desc"), ("id", "asc")]
        full = sorted(zip(t["v"], t["id"]), key=lambda r: (-r[0], r[1]))
        pages, after = [], None
        for _ in range(4):
            rows = search_after(ray.data.from_arrow(tab), keys, after, 150).take_all()
            if not rows:
                break
            pages.extend((r["v"], r["id"]) for r in rows)
            after = [rows[-1]["v"], rows[-1]["id"]]
        assert pages == full  # pages partition the full ordering exactly

    def test_after_mask_strictness(self):
        import pyarrow as pa

        from neural_search_ray.rank.paging import _after_mask

        b = pa.table({"v": [3.0, 2.0, 2.0, 1.0], "id": [7, 5, 9, 1]})
        m = _after_mask(b, [("v", "desc"), ("id", "asc")], [2.0, 5])
        # after (2.0, 5): qualifying = (2.0, 9) and (1.0, 1); (3.0,·) is
        # before, (2.0, 5) itself is excluded
        assert m.tolist() == [False, False, True, True]

    def test_after_length_mismatch(self):
        import ray.data

        from neural_search_ray.rank.paging import search_after

        with pytest.raises(ValueError):
            search_after(ray.data.range(5), [("id", "asc")], [1, 2], 10)


class TestSemanticHighlight:
    def test_sentence_mode(self):
        from neural_search_ray.rank.highlight import highlight_text

        text = "The cat sat here. Vector search is fast and scalable. Nothing else."
        out, score = highlight_text({"vector", "search"}, text)
        assert out == (
            "The cat sat here. <em>Vector search is fast and scalable.</em> Nothing else."
        )
        assert score == 2

    def test_window_mode_and_zero_overlap(self):
        from neural_search_ray.rank.highlight import highlight_text

        text = " ".join(f"w{i}" for i in range(50))
        out, score = highlight_text({"w25"}, text, window=20)
        assert score == 1
        assert out.startswith("w0") and "<em>w20" in out and out.endswith("w49")
        # zero overlap → unchanged
        out2, s2 = highlight_text({"absent"}, text, window=20)
        assert out2 == text and s2 == 0

    def test_custom_scorer_seam(self):
        from neural_search_ray.rank.highlight import highlight_text

        # a "model" scorer that prefers the LAST fragment
        def last_wins(frags, terms):
            return np.arange(len(frags))

        text = "One sentence here. Another sentence there."
        out, _ = highlight_text(set(), text, scorer=last_wins)
        assert out.endswith("<em>Another sentence there.</em>")

    def test_stage_batch(self):
        import pyarrow as pa

        from neural_search_ray.rank.highlight import SemanticHighlightStage

        batch = pa.table({
            "query_id": pa.array([0], pa.int64()),
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["alpha beta. gamma delta query."]),
            "query_text": pa.array(["the query"]),
        })
        out = SemanticHighlightStage()(batch)
        assert out["highlighted"][0].as_py() == "alpha beta. <em>gamma delta query.</em>"


class TestWeightedHighlight:
    def test_rare_term_wins_over_stopword_pile(self):
        from neural_search_ray.rank.highlight import (
            highlight_text,
            make_weighted_scorer,
        )

        # window 1: three low-weight terms; window 2: one rare term.
        # Overlap scoring picks window 1; idf weighting picks window 2.
        w1 = "the of and " + "x " * 17
        w2 = "zebra " + "y " * 19
        text = (w1 + w2).strip()
        terms = {"the", "of", "and", "zebra"}
        weights = {"the": 1, "of": 1, "and": 1, "zebra": 100}
        hl_overlap, s1 = highlight_text(terms, text)
        hl_idf, s2 = highlight_text(
            terms, text, scorer=make_weighted_scorer(weights)
        )
        assert "<em>the of and" in hl_overlap
        assert "<em>zebra" in hl_idf
        assert s2 == 100

    def test_zero_weight_terms_leave_text_unchanged(self):
        from neural_search_ray.rank.highlight import (
            highlight_text,
            make_weighted_scorer,
        )

        text = "alpha beta gamma " * 10
        out, score = highlight_text(
            {"alpha"}, text.strip(), scorer=make_weighted_scorer({})
        )
        assert out == text.strip() and score == 0


class TestRankEval:
    def test_metrics_hand_computed(self):
        import math

        from neural_search_ray.query.rankeval import rank_eval_query

        # ranked: [5, 9, 2, 7]; relevant: {9, 7, 42}; total_relevant=3
        m = rank_eval_query(
            np.array([5, 9, 2, 7]), {9, 7, 42}, 3, k=10
        )
        assert m["n_rel_retrieved"] == 2.0
        assert m["precision"] == 2.0 / 4  # ES divides by actual retrieved
        assert m["recall"] == 2.0 / 3
        assert m["mrr"] == 1.0 / 2
        dcg = 1 / math.log2(3) + 1 / math.log2(5)
        idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
        assert abs(m["ndcg"] - dcg / idcg) < 1e-12

    def test_edge_cases(self):
        from neural_search_ray.query.rankeval import rank_eval_query

        # no relevant docs exist at all
        m = rank_eval_query(np.array([1, 2]), set(), 0, k=10)
        assert (m["precision"], m["recall"], m["mrr"], m["ndcg"]) == (0, 0, 0, 0)
        # empty run
        m = rank_eval_query(np.array([], dtype=np.int64), {1}, 1, k=10)
        assert m["precision"] == 0.0 and m["ndcg"] == 0.0
        # perfect run
        m = rank_eval_query(np.array([1, 2]), {1, 2}, 2, k=10)
        assert m["precision"] == 1.0 and m["recall"] == 1.0
        assert m["mrr"] == 1.0 and abs(m["ndcg"] - 1.0) < 1e-12
        # k truncation: only the first k ranks count
        m = rank_eval_query(np.array([3, 1]), {1}, 1, k=1)
        assert m["recall"] == 0.0

    def test_keyset_after_scores(self):
        from neural_search_ray.rank.paging import keyset_after_scores

        docs = np.array([4, 1, 3, 2])
        sc = np.array([5.0, 5.0, 4.0, 3.0])
        # ranking: (1,5.0) (4,5.0) (3,4.0) (2,3.0)
        d, s = keyset_after_scores(docs, sc, None, 2)
        assert d.tolist() == [1, 4]
        d, s = keyset_after_scores(docs, sc, (5.0, 4), 2)  # after (5.0, 4)
        assert d.tolist() == [3, 2] and s.tolist() == [4.0, 3.0]
        d, s = keyset_after_scores(docs, sc, (3.0, 2), 2)  # past the end
        assert d.size == 0


class TestRetrieverTree:
    """query/retriever.py — declarative retriever execution over the
    oracle-pinned hybrid machinery."""

    @pytest.fixture(scope="class")
    def r_searcher(self, tmp_path_factory, sf_dir, ray_session):
        import ray

        from neural_search_ray.config import IndexConfig
        from neural_search_ray.index.build import build_index
        from neural_search_ray.query.engine import IndexSearcher

        d = str(tmp_path_factory.mktemp("retr_idx"))
        build_index(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            d,
            IndexConfig(num_shards=2, num_salts=2, index_positions=True),
        )
        return IndexSearcher(d)

    def test_standard_leaf_equals_direct(self, r_searcher):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        d, v = execute_retriever(
            {"standard": {"query": {"match": {"text": "data query"}}}},
            searcher=r_searcher, k=7,
        )
        d2, v2 = r_searcher.search_bm25(tokenize("data query"), k=7)
        assert d.tolist() == d2.tolist()
        np.testing.assert_array_equal(v, v2)

    def test_rrf_equals_manual_fusion(self, r_searcher):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        spec = {
            "rrf": {
                "retrievers": [
                    {"standard": {"query": {"match": {"text": "data query"}}}},
                    {"standard": {"query": {"match_phrase": {"text": "data query"}}}},
                ],
                "rank_constant": 60,
                "rank_window_size": 10,
            }
        }
        d, v = execute_retriever(spec, searcher=r_searcher, k=5)
        subs = [
            r_searcher.search_bm25(tokenize("data query"), k=10),
            r_searcher.search_phrase(tokenize("data query"), k=10),
        ]
        d2, v2 = hybrid_rank(
            subs, normalization="rrf", combination="rrf", k=5,
            rank_constant=60,
        )
        assert d.tolist() == d2.tolist()
        np.testing.assert_allclose(v, v2, rtol=0)

    def test_linear_weights_and_nesting(self, r_searcher):
        """linear over a nested rrf child + a standard leaf; weights
        normalize to sum 1 (hybrid_rank's weight contract)."""
        from neural_search_ray.query.retriever import execute_retriever

        spec = {
            "linear": {
                "retrievers": [
                    {"retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                     "weight": 3.0},
                    {"retriever": {"rrf": {"retrievers": [
                        {"standard": {"query": {"term": {"text": "data"}}}},
                        {"standard": {"query": {"term": {"text": "query"}}}},
                    ]}}, "weight": 1.0},
                ],
                "rank_window_size": 10,
            }
        }
        d, v = execute_retriever(spec, searcher=r_searcher, k=5)
        assert d.size == 5 and np.all(np.diff(v) <= 0)

    def test_knn_leaf_delegation_and_validation(self, r_searcher):
        from neural_search_ray.query.retriever import execute_retriever

        calls = []

        def fake_knn(body, k):
            calls.append((body, k))
            return np.array([42], np.int64), np.array([0.9])

        d, v = execute_retriever(
            {"knn": {"field": "emb"}}, searcher=r_searcher, k=3,
            knn_fn=fake_knn,
        )
        assert d.tolist() == [42] and calls[0][1] == 3
        with pytest.raises(ValueError, match="knn_fn"):
            execute_retriever({"knn": {}}, searcher=r_searcher)
        with pytest.raises(ValueError, match="one type key"):
            execute_retriever({}, searcher=r_searcher)
        with pytest.raises(ValueError, match="unknown retriever"):
            execute_retriever({"nope": {}}, searcher=r_searcher)
        with pytest.raises(ValueError, match="non-empty"):
            execute_retriever({"rrf": {"retrievers": []}}, searcher=r_searcher)
        with pytest.raises(ValueError, match="sum > 0"):
            execute_retriever(
                {"linear": {"retrievers": [
                    {"retriever": {"standard": {"query": {"term": {"text": "data"}}}},
                     "weight": 0.0}]}},
                searcher=r_searcher,
            )


class TestRescorerRuleRetrievers:
    """rescorer + rule retriever kinds (query/retriever.py)."""

    @pytest.fixture(scope="class")
    def rr_searcher(self, tmp_path_factory, sf_dir, ray_session):
        import ray

        from neural_search_ray.config import IndexConfig
        from neural_search_ray.index.build import build_index
        from neural_search_ray.query.engine import IndexSearcher

        d = str(tmp_path_factory.mktemp("rescr_idx"))
        build_index(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            d,
            IndexConfig(num_shards=2, num_salts=2),
        )
        return IndexSearcher(d)

    def test_rescorer_blend_matches_manual(self, rr_searcher):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        spec = {
            "rescorer": {
                "retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                "rescore": {
                    "window_size": 8,
                    "query": {"match": {"text": "fast merge"}},
                    "query_weight": 0.5,
                    "rescore_query_weight": 2.0,
                },
            }
        }
        d, v = execute_retriever(spec, searcher=rr_searcher, k=5)
        wd, wv = rr_searcher.search_bm25(tokenize("data query"), k=8)
        cand, rsc = rr_searcher._bm25_union_scores(tokenize("fast merge"), None)
        lut = dict(zip(cand.tolist(), rsc.tolist()))
        blended = [0.5 * s + 2.0 * lut.get(doc, 0.0)
                   for doc, s in zip(wd.tolist(), wv.tolist())]
        exp = sorted(zip(wd.tolist(), blended), key=lambda t: (-t[1], t[0]))[:5]
        assert d.tolist() == [e[0] for e in exp]
        np.testing.assert_allclose(v, [e[1] for e in exp])

    def test_rescorer_identity_weights(self, rr_searcher):
        """qw=1, rqw=0 reduces to the child ranking."""
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        spec = {
            "rescorer": {
                "retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                "rescore": {"window_size": 10,
                            "query": {"match": {"text": "merge"}},
                            "query_weight": 1.0,
                            "rescore_query_weight": 0.0},
            }
        }
        d, v = execute_retriever(spec, searcher=rr_searcher, k=5)
        d2, v2 = rr_searcher.search_bm25(tokenize("data query"), k=5)
        assert d.tolist() == d2.tolist()
        np.testing.assert_allclose(v, v2)

    def test_rescorer_validation(self, rr_searcher):
        from neural_search_ray.query.retriever import execute_retriever

        with pytest.raises(ValueError, match="retriever.*rescore|rescore"):
            execute_retriever({"rescorer": {}}, searcher=rr_searcher)
        with pytest.raises(ValueError, match="match"):
            execute_retriever(
                {"rescorer": {
                    "retriever": {"standard": {"query": {"term": {"text": "data"}}}},
                    "rescore": {"query": {"term": {"text": "data"}}}}},
                searcher=rr_searcher,
            )

    def test_rule_pins_and_excludes(self, rr_searcher):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        base, _ = rr_searcher.search_bm25(tokenize("data query"), k=10)
        victim = int(base[0])  # exclude the organic top hit
        spec = {
            "rule": {
                "retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                "ruleset": [
                    {"criteria_term": "promo", "pinned_ids": [5, 11],
                     "excluded_ids": [victim]},
                    {"criteria_term": "other", "pinned_ids": [victim]},
                ],
                "match_criteria": "promo",
            }
        }
        d, v = execute_retriever(spec, searcher=rr_searcher, k=10)
        assert d.tolist()[:2] == [5, 11]
        assert victim not in d.tolist()
        # synthetic pin scores sit above every organic score, in order
        assert v[0] > v[1] > v[2]
        # organic tail = base ranking minus victim and pins
        exp_tail = [x for x in base.tolist() if x not in (victim, 5, 11)][:8]
        assert d.tolist()[2:] == exp_tail

    def test_rule_no_matching_criteria_is_inert(self, rr_searcher):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        spec = {
            "rule": {
                "retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                "ruleset": [{"criteria_term": "other", "pinned_ids": [5]}],
                "match_criteria": "promo",
            }
        }
        d, v = execute_retriever(spec, searcher=rr_searcher, k=5)
        d2, v2 = rr_searcher.search_bm25(tokenize("data query"), k=5)
        assert d.tolist() == d2.tolist()
        np.testing.assert_allclose(v, v2)

    def test_rule_validation(self, rr_searcher):
        from neural_search_ray.query.retriever import execute_retriever

        with pytest.raises(ValueError, match="ruleset|match_criteria"):
            execute_retriever({"rule": {}}, searcher=rr_searcher)

    def test_rule_nonexistent_pinned_filtered(self, rr_searcher):
        """Pinned ids go through the searcher's id-membership rule
        (same as engine.search_pinned): a nonexistent id must NOT
        surface as a top-ranked synthetic result."""
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.query.retriever import execute_retriever

        spec = {
            "rule": {
                "retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                "ruleset": [
                    {"criteria_term": "promo", "pinned_ids": [10**15, 7]},
                ],
                "match_criteria": "promo",
            }
        }
        d, v = execute_retriever(spec, searcher=rr_searcher, k=10)
        assert 10**15 not in d.tolist()
        assert d.tolist()[0] == 7  # the existing pin still leads
        # the ghost pin must not consume a slot either
        base, _ = rr_searcher.search_bm25(tokenize("data query"), k=10)
        exp_tail = [x for x in base.tolist() if x != 7][:9]
        assert d.tolist()[1:] == exp_tail


class TestSemanticRerankerRetriever:
    """text_similarity_reranker retriever kind (query/retriever.py)."""

    def test_matches_manual_seam(self, tmp_path_factory, sf_dir, ray_session):
        import pyarrow.parquet as pq
        import ray

        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.config import IndexConfig
        from neural_search_ray.index.build import build_index
        from neural_search_ray.query.engine import IndexSearcher
        from neural_search_ray.query.retriever import execute_retriever
        from neural_search_ray.rank.rerank import rerank_rescore

        d = str(tmp_path_factory.mktemp("semr_idx"))
        build_index(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            d,
            IndexConfig(num_shards=2, num_salts=2),
        )
        searcher = IndexSearcher(d)
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

        def texts_fn(ids):
            return [texts.get(int(i), "") for i in ids]

        spec = {
            "text_similarity_reranker": {
                "retriever": {"standard": {"query": {"match": {"text": "data query"}}}},
                "inference_text": "data query",
                "rank_window_size": 12,
            }
        }
        docs, scores = execute_retriever(
            spec, searcher=searcher, k=4, texts_fn=texts_fn
        )
        wd, _ = searcher.search_bm25(tokenize("data query"), k=12)
        ed, es = rerank_rescore("data query", wd, texts_fn(wd))
        assert docs.tolist() == ed[:4].tolist()
        import numpy as np

        np.testing.assert_allclose(scores, es[:4])

    def test_validation(self, tmp_path_factory, sf_dir, ray_session):
        import ray
        import pytest as _pytest

        from neural_search_ray.config import IndexConfig
        from neural_search_ray.index.build import build_index
        from neural_search_ray.query.engine import IndexSearcher
        from neural_search_ray.query.retriever import execute_retriever

        d = str(tmp_path_factory.mktemp("semr_idx2"))
        build_index(
            ray.data.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            ),
            d,
            IndexConfig(num_shards=2, num_salts=2),
        )
        s = IndexSearcher(d)
        with _pytest.raises(ValueError, match="inference_text"):
            execute_retriever(
                {"text_similarity_reranker": {"retriever": {"standard": {"query": {"term": {"text": "a"}}}}}},
                searcher=s, texts_fn=lambda ids: [],
            )
        with _pytest.raises(ValueError, match="texts_fn"):
            execute_retriever(
                {"text_similarity_reranker": {
                    "retriever": {"standard": {"query": {"term": {"text": "a"}}}},
                    "inference_text": "a"}},
                searcher=s,
            )
