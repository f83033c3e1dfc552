"""terms_set / function_score queries, range / multi_terms /
weighted_avg / diversified_sampler aggregations, and the percolator
(query/percolate.py) — brute-force reference checks over the sf0.001
documents table."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import IndexConfig
from neural_search_ray.index.build import build_index
from neural_search_ray.query.engine import IndexSearcher
from neural_search_ray.query.percolate import PercolateIndex, percolate_dataset

QUERIES = [
    (0, "data query"),
    (1, "merge sort window"),
    (2, "the fast join"),
]


@pytest.fixture(scope="module")
def searcher(tmp_path_factory, sf_dir, ray_session):
    from neural_search_ray.index.docvalues import build_doc_values

    d = str(tmp_path_factory.mktemp("tsp_idx"))
    build_index(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ),
        d,
        IndexConfig(num_shards=2, num_salts=2),
    )
    build_doc_values(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "source", "n_chars"],
        ),
        d,
        num_shards=2,
    )
    return IndexSearcher(d)


@pytest.fixture(scope="module")
def docs(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    return {
        int(r["doc_id"]): (
            set(tokenize(r["text"])),
            r["lang"],
            r["source"],
            int(r["n_chars"]),
        )
        for r in t.to_pylist()
    }


class TestTermsSet:
    def test_candidates_match_bruteforce(self, searcher, docs):
        for _, qtext in QUERIES:
            terms = sorted(set(tokenize(qtext)))
            for msm in (1, 2, len(terms)):
                got_docs, got_scores = searcher.search_terms_set(
                    terms, msm, k=10**9
                )
                want = {
                    d
                    for d, (toks, *_ ) in docs.items()
                    if len(toks & set(terms)) >= msm
                }
                assert set(got_docs.tolist()) == want
                # scores equal the full-union BM25 scores of those docs
                union, scores = searcher._bm25_union_scores(terms, None)
                ref = dict(zip(union.tolist(), scores.tolist()))
                for d, s in zip(got_docs.tolist(), got_scores.tolist()):
                    assert s == pytest.approx(ref[d], rel=0, abs=0)

    def test_msm_one_equals_bool_or(self, searcher):
        terms = sorted(set(tokenize("data query")))
        d1, _ = searcher.search_terms_set(terms, 1, k=10**9)
        assert set(d1.tolist()) == set(searcher._match_union(terms).tolist())

    def test_msm_above_nterms_empty(self, searcher):
        terms = sorted(set(tokenize("data query")))
        d, s = searcher.search_terms_set(terms, len(terms) + 1, k=10)
        assert d.size == 0 and s.size == 0


class TestFunctionScore:
    def test_boost_formula(self, searcher, docs):
        terms = sorted(set(tokenize("vector search")))
        got_d, got_s = searcher.search_function_score(
            terms, "n_chars", k=10**9, factor=1.0, modifier="ln1p",
            weight=1.5,
        )
        union, base = searcher._bm25_union_scores(terms, None)
        ref = {
            int(d): s * (1.5 * np.log(1.0 + docs[int(d)][3]))
            for d, s in zip(union, base)
        }
        assert set(got_d.tolist()) == set(ref)
        for d, s in zip(got_d.tolist(), got_s.tolist()):
            assert s == ref[d]

    def test_modifiers_and_unknown(self, searcher):
        terms = ["data"]
        for mod in ("ln", "sqrt", "none"):
            d, s = searcher.search_function_score(
                terms, "n_chars", k=5, modifier=mod
            )
            assert d.size > 0 and np.all(np.isfinite(s))
        with pytest.raises(ValueError):
            searcher.search_function_score(terms, "n_chars", modifier="bogus")


class TestAggRange:
    def test_counts_and_sums(self, searcher, docs):
        ranges = [(None, 100), (100, 400), (400, None), (None, None)]
        terms = sorted(set(tokenize("the fast join")))
        out = searcher.agg_range(terms, "n_chars", ranges)
        match = {
            d for d, (toks, *_ ) in docs.items() if toks & set(terms)
        }
        for (lo, hi), row in zip(ranges, out):
            sel = [
                docs[d][3]
                for d in match
                if (lo is None or docs[d][3] >= lo)
                and (hi is None or docs[d][3] < hi)
            ]
            assert row["cnt"] == len(sel)
            assert row["sum_v"] == sum(sel)
        # (None, None) covers the whole match set
        assert out[3]["cnt"] == len(match)

    def test_empty_match_emits_zero_buckets(self, searcher):
        out = searcher.agg_range(["zzzznoterm"], "n_chars", [(None, 10)])
        assert out == [{"from": None, "to": 10, "cnt": 0, "sum_v": 0}]


class TestDiversifiedSampler:
    def test_greedy_reference(self, searcher, docs):
        terms = sorted(set(tokenize("the fast join")))
        values, counts = searcher.agg_diversified_sampler(
            terms, "lang", "source", shard_size=10, max_docs_per_value=2
        )
        # brute greedy walk
        union, scores = searcher._bm25_union_scores(terms, None)
        r6 = np.floor(scores * 1e6 + 0.5) / 1e6
        order = np.lexsort((union, -r6))
        taken, per_lang = [], {}
        for i in order:
            d = int(union[i])
            lang = docs[d][1]
            if per_lang.get(lang, 0) >= 2:
                continue
            per_lang[lang] = per_lang.get(lang, 0) + 1
            taken.append(d)
            if len(taken) == 10:
                break
        want: dict[str, int] = {}
        for d in taken:
            want[docs[d][2]] = want.get(docs[d][2], 0) + 1
        got = dict(zip(values, counts.tolist()))
        assert got == want
        # ordered by (count desc, value asc)
        pairs = list(zip(counts.tolist(), values))
        assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


class TestMultiTermsWeightedAvg:
    def test_multi_terms_bruteforce(self, searcher, docs):
        terms = sorted(set(tokenize("data query")))
        buckets, counts = searcher.agg_multi_terms(
            terms, ["lang", "source"], size=None
        )
        want: dict[tuple, int] = {}
        for d, (toks, lang, src, _n) in docs.items():
            if toks & set(terms):
                want[(lang, src)] = want.get((lang, src), 0) + 1
        assert dict(zip(buckets, counts.tolist())) == want

    def test_weighted_avg_bruteforce(self, searcher, docs):
        terms = sorted(set(tokenize("data query")))
        a = searcher.agg_weighted_avg(terms, "n_chars")
        match = sorted(
            d for d, (toks, *_ ) in docs.items() if toks & set(terms)
        )
        dl = searcher.doc_length(np.asarray(match, dtype=np.int64))
        sum_vw = sum(docs[d][3] * int(w) for d, w in zip(match, dl))
        sum_w = int(dl.sum())
        assert a["sum_vw"] == sum_vw and a["sum_w"] == sum_w
        assert a["value"] == sum_vw / sum_w


class TestMatrixStats:
    def test_moments_vs_numpy(self, searcher, docs):
        terms = sorted(set(tokenize("the fast join")))
        m = searcher.agg_matrix_stats(terms, "n_chars")
        match = sorted(
            d for d, (toks, *_ ) in docs.items() if toks & set(terms)
        )
        x = np.asarray([docs[d][3] for d in match], dtype=np.float64)
        y = searcher.doc_length(np.asarray(match, np.int64)).astype(np.float64)
        assert m["n"] == len(match)
        assert m["mean_x"] == pytest.approx(x.mean())
        assert m["var_x"] == pytest.approx(x.var())
        assert m["cov"] == pytest.approx(((x - x.mean()) * (y - y.mean())).mean())
        assert m["corr"] == pytest.approx(np.corrcoef(x, y)[0, 1])
        xc = x - x.mean()
        m2, m3, m4 = (xc**2).mean(), (xc**3).mean(), (xc**4).mean()
        assert m["skew_x"] == pytest.approx(m3 / m2**1.5)
        assert m["kurt_x"] == pytest.approx(m4 / m2**2)

    def test_empty_match(self, searcher):
        assert searcher.agg_matrix_stats(["zzzznoterm"], "n_chars") == {"n": 0}

    def test_distributed_core_identical(self, searcher, ray_session):
        from neural_search_ray.query.distributed import DistributedSearcher

        d = DistributedSearcher(searcher.index_dir, num_actors=2)
        terms = sorted(set(tokenize("data query")))
        single = searcher.agg_matrix_stats(terms, "n_chars")
        dist = d.agg_matrix_stats(terms, "n_chars")
        for k in ("n", "sum_x", "sum_y", "sum_xy", "mean_x", "mean_y",
                  "var_x", "var_y", "cov", "corr"):
            assert single[k] == dist[k]  # bit-identical: same exact sums


class TestFilteredKnn:
    def test_filter_is_exact_prefilter(self, sf_dir, ray_session, docs):
        import pyarrow.parquet as pq

        from neural_search_ray.ann.brute import knn_brute_force

        qt = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", 2)],
        )
        queries = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
        qids = qt["vec_id"].to_numpy()
        accepted = np.asarray(
            [d for d, (_t, lang, *_r) in docs.items() if lang == "en"],
            dtype=np.int64,
        )
        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        out = knn_brute_force(ds, queries, qids, k=5, accepted_ids=accepted)
        neigh = set(out["neighbor_id"].to_pylist())
        assert neigh <= set(accepted.tolist())
        # brute reference over the accepted subset only
        t = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = t["vec_id"].to_numpy()
        emb = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        keep = np.isin(ids, accepted)
        ids, emb = ids[keep], emb[keep]
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        sims = q @ emb.T
        for qi, qid in enumerate(qids):
            order = np.lexsort((ids, -sims[qi]))[:5]
            want = ids[order].tolist()
            got = [
                r["neighbor_id"]
                for r in out.to_pylist()
                if r["query_id"] == qid
            ]
            assert got == want

    def test_empty_accepted_set(self, sf_dir, ray_session):
        import pyarrow.parquet as pq

        from neural_search_ray.ann.brute import knn_brute_force

        qt = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", 1)],
        )
        queries = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        out = knn_brute_force(
            ds, queries, qt["vec_id"].to_numpy(), k=5,
            accepted_ids=np.empty(0, np.int64),
        )
        assert out.num_rows == 0


class TestDistributedParity:
    def test_terms_set_function_score_range(self, searcher, ray_session):
        from neural_search_ray.query.distributed import DistributedSearcher

        d = DistributedSearcher(searcher.index_dir, num_actors=2)
        terms = sorted(set(tokenize("the fast join")))
        for msm in (1, 2, 3):
            sd, ss = searcher.search_terms_set(terms, msm, k=10)
            dd, ds_ = d.search_terms_set(terms, msm, k=10)
            np.testing.assert_array_equal(sd, dd)
            np.testing.assert_allclose(ss, ds_, rtol=0, atol=0)
        sd, ss = searcher.search_function_score(
            terms, "n_chars", k=10, factor=1.0, modifier="ln1p", weight=1.5
        )
        dd, ds_ = d.search_function_score(
            terms, "n_chars", k=10, factor=1.0, modifier="ln1p", weight=1.5
        )
        np.testing.assert_array_equal(sd, dd)
        np.testing.assert_allclose(ss, ds_, rtol=0, atol=0)
        ranges = [(None, 100), (100, 400), (400, None)]
        assert searcher.agg_range(terms, "n_chars", ranges) == d.agg_range(
            terms, "n_chars", ranges
        )


class TestPercolate:
    def _batch(self, rows):
        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )

    def test_match_semantics(self):
        idx = PercolateIndex([(0, "red fox"), (1, "lazy dog"), (2, "fox")])
        out = idx.match_batch(
            self._batch(
                [
                    (10, "the quick red fox jumps"),
                    (11, "red paint"),
                    (12, "lazy lazy dog dog"),
                    (13, ""),
                ]
            )
        )
        got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
        assert got == {(10, 0), (10, 2), (12, 1)}

    def test_duplicate_terms_in_doc_count_once(self):
        idx = PercolateIndex([(7, "a b")])
        out = idx.match_batch(self._batch([(1, "a a a"), (2, "a b a b")]))
        got = set(zip(out["doc_id"].to_pylist(), out["query_id"].to_pylist()))
        assert got == {(2, 7)}

    def test_empty_query_set_and_empty_batch(self):
        idx = PercolateIndex([])
        out = idx.match_batch(self._batch([(1, "x")]))
        assert out.num_rows == 0
        idx2 = PercolateIndex([(0, "x")])
        assert idx2.match_batch(self._batch([])).num_rows == 0

    def test_dataset_path_matches_bruteforce(self, sf_dir, ray_session, docs):
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        out = percolate_dataset(ds, QUERIES).take_all()
        got = {(r["doc_id"], r["query_id"]) for r in out}
        want = set()
        for qid, qtext in QUERIES:
            need = set(tokenize(qtext))
            for d, (toks, *_ ) in docs.items():
                if need <= toks:
                    want.add((d, qid))
        assert got == want


class TestSourceMix:
    def test_rates_math_and_saturation(self):
        from neural_search_ray.corpus.mix import source_mix_rates

        import math

        counts = {"a": 100, "b": 400, "c": 4}
        ppm = source_mix_rates(counts, target_frac=0.5, alpha=0.5)
        N = 504
        W = sum(math.sqrt(c) for c in (100, 400, 4))
        for s, c in counts.items():
            want = min(1.0, (0.5 * N) * math.sqrt(c) / W / c)
            assert ppm[s] == int(math.floor(want * 1e6 + 0.5))
        # a tiny source upweighted past 1.0 saturates at 1e6 ppm
        ppm2 = source_mix_rates({"a": 10000, "b": 1}, 0.9, alpha=0.1)
        assert ppm2["b"] == 1_000_000

    def test_sample_hits_target_fraction(self, sf_dir, ray_session):
        from neural_search_ray.corpus.mix import source_mix_sample

        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        )
        n_total = ds.count()
        out = source_mix_sample(ds, target_frac=0.5, alpha=0.5)
        n_kept = out.count()
        # md5 gate is uniform: binomial noise around the target
        assert abs(n_kept / n_total - 0.5) < 0.1
        # deterministic: the same sample on a second pass
        assert source_mix_sample(ds, target_frac=0.5, alpha=0.5).count() == n_kept

    def test_alpha_upweights_small_sources(self):
        from neural_search_ray.corpus.mix import source_mix_rates

        counts = {"big": 10000, "small": 100}
        flat = source_mix_rates(counts, 0.3, alpha=1.0)
        temp = source_mix_rates(counts, 0.3, alpha=0.5)
        assert flat["big"] == flat["small"]  # alpha=1 is proportional
        assert temp["small"] > temp["big"]


class TestSq8Rescore:
    def test_recall_and_exact_scores(self, sf_dir, ray_session):
        import pyarrow.parquet as pq

        from neural_search_ray.ann.brute import knn_brute_force
        from neural_search_ray.ann.sq8 import (
            knn_sq8_rescore,
            train_sq8_scales,
        )

        ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        scales = train_sq8_scales(ds)
        qt = pq.read_table(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "<", 3)],
        )
        queries = np.asarray(qt["embedding"].to_pylist(), dtype=np.float64)
        qids = qt["vec_id"].to_numpy()

        def fetch(ids):
            t = pq.read_table(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"],
                filters=[("vec_id", "in", [int(i) for i in ids])],
            )
            return (
                t["vec_id"].to_numpy(),
                np.asarray(t["embedding"].to_pylist(), dtype=np.float64),
            )

        got = knn_sq8_rescore(ds, queries, qids, scales, fetch, k=10,
                              oversample=3)
        exact = knn_brute_force(ds, queries, qids, k=10)
        for q in qids:
            g = [r["neighbor_id"] for r in got.to_pylist() if r["query_id"] == q]
            e = [r["neighbor_id"] for r in exact.to_pylist() if r["query_id"] == q]
            recall = len(set(g) & set(e)) / len(e)
            assert recall >= 0.8, (q, recall)
        # phase-2 scores are the TRUE cosines for every returned pair
        ex = {(r["query_id"], r["neighbor_id"]): r["score"]
              for r in exact.to_pylist()}
        for r in got.to_pylist():
            key = (r["query_id"], r["neighbor_id"])
            if key in ex:
                assert r["score"] == pytest.approx(ex[key], abs=1e-12)


class TestPercolateCriteria:
    """Percolator metadata criteria (bool-with-range form)."""

    def _batch(self):
        import pyarrow as pa

        return pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "data merge", "data only here", "other words", "data big",
            ], pa.string()),
            "n_chars": pa.array([100, 350, 500, 400], pa.int64()),
            "lang": pa.array(["en", "fr", "en", "en"], pa.string()),
        })

    def test_criteria_filter_hits(self):
        from neural_search_ray.query.percolate import PercolateIndex

        idx = PercolateIndex([
            (0, "data", [("n_chars", ">=", 300)]),
            (1, "data", [("lang", "==", "en")]),
            (2, "data", []),
        ])
        rows = sorted(
            (r["query_id"], r["doc_id"])
            for r in idx.match_batch(self._batch()).to_pylist()
        )
        # q0: docs with 'data' AND n_chars>=300 -> 2, 4
        # q1: docs with 'data' AND lang=en -> 1, 4
        # q2: every 'data' doc -> 1, 2, 4
        assert rows == [
            (0, 2), (0, 4), (1, 1), (1, 4), (2, 1), (2, 2), (2, 4),
        ]

    def test_conjunctive_criteria(self):
        from neural_search_ray.query.percolate import PercolateIndex

        idx = PercolateIndex([
            (7, "data", [("n_chars", ">", 300), ("lang", "==", "en")]),
        ])
        rows = [(r["query_id"], r["doc_id"])
                for r in idx.match_batch(self._batch()).to_pylist()]
        assert rows == [(7, 4)]

    def test_bad_op_rejected(self):
        import pytest as _pytest

        from neural_search_ray.query.percolate import PercolateIndex

        with _pytest.raises(ValueError, match="criteria op"):
            PercolateIndex([(0, "data", [("n_chars", "~", 1)])])
