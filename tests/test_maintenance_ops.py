"""Query-driven index maintenance (delete_by_query / update_by_query),
the script_score query, the unordered n-term intervals matcher,
span_first, and sliced-scroll pagination."""

import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray

from neural_search_ray.analysis.analyzer import tokenize
from neural_search_ray.config import IndexConfig
from neural_search_ray.index.build import build_index
from neural_search_ray.index.deletes import delete_by_query, update_by_query
from neural_search_ray.query.engine import IndexSearcher
from neural_search_ray.query.scripts import SCORE_SCRIPTS, ScoreScript


def _docs_ds(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )


def _corpus(sf_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return {
        int(d): tokenize(x)
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


@pytest.fixture(scope="module")
def base_index(tmp_path_factory, sf_dir, ray_session):
    d = str(tmp_path_factory.mktemp("maint") / "idx")
    build_index(_docs_ds(sf_dir), d, IndexConfig(num_shards=2, num_salts=1))
    return d


@pytest.fixture(scope="module")
def pos_index(tmp_path_factory, sf_dir, ray_session):
    d = str(tmp_path_factory.mktemp("maintpos") / "idx")
    build_index(
        _docs_ds(sf_dir),
        d,
        IndexConfig(num_shards=2, num_salts=1, index_positions=True),
    )
    return d


class TestDeleteByQuery:
    def test_matched_docs_excluded_stats_stale(self, base_index, sf_dir, tmp_path):
        d = str(tmp_path / "dbq")
        shutil.copytree(base_index, d, copy_function=shutil.copy)
        before = IndexSearcher(d)
        matched = set(before.match_docs(["dup"]).tolist())
        assert matched, "test corpus must contain the rare term"
        n = delete_by_query(d, ["dup"])
        assert n == len(matched)
        after = IndexSearcher(d)
        docs, _ = after.search_bm25(["data", "query"], k=10_000)
        assert not (set(docs.tolist()) & matched)
        # liveDocs model: stats stay stale until purge
        assert after.n_docs == before.n_docs
        # idempotent: same query again tombstones nothing new
        assert delete_by_query(d, ["dup"]) == 0

    def test_no_match_is_noop(self, base_index, tmp_path):
        d = str(tmp_path / "dbq2")
        shutil.copytree(base_index, d, copy_function=shutil.copy)
        assert delete_by_query(d, ["zzzznotaterm"]) == 0


class TestUpdateByQuery:
    def test_matched_docs_transformed(self, base_index, sf_dir, tmp_path):
        d = str(tmp_path / "ubq")
        shutil.copytree(base_index, d, copy_function=shutil.copy)
        matched = set(IndexSearcher(d).match_docs(["dup"]).tolist())

        def prepend(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            text = pc.binary_join_element_wise(
                pa.array(["zzmarker "] * len(batch), type=pa.string()),
                batch["text"],
                "",
            )
            return pa.table({"doc_id": batch["doc_id"], "text": text})

        update_by_query(
            d, ["dup"], _docs_ds(sf_dir), prepend, segment_id="seg-u1"
        )
        s = IndexSearcher(d)
        # exactly the matched docs carry the marker token now
        docs, _ = s.search_bm25(["zzmarker"], k=10_000)
        assert set(docs.tolist()) == matched
        # stats recomputed: corpus size unchanged, avgdl grew by the
        # one-token prepend on |matched| docs
        assert s.n_docs == IndexSearcher(base_index).n_docs


class TestScriptScore:
    def test_length_norm_matches_manual(self, base_index, sf_dir):
        s = IndexSearcher(base_index)
        terms = tokenize("data query")
        script = SCORE_SCRIPTS["length_norm"]("n_chars")
        # doc-values sidecar: build from the documents table
        import os

        from neural_search_ray.index.docvalues import (
            DOCVALUES_DIR,
            build_doc_values,
        )

        if not os.path.exists(os.path.join(base_index, DOCVALUES_DIR)):
            build_doc_values(
                ray.data.read_parquet(
                    f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang", "source", "n_chars"],
                ),
                base_index,
                num_shards=s.manifest.num_doc_shards,
            )
            s = IndexSearcher(base_index)
        docs, scores = s.search_script_score(terms, script, k=25)
        base_docs, base_scores = s._bm25_union_scores(terms, None)
        n_chars = s.field_values(base_docs, "n_chars").to_numpy(
            zero_copy_only=False
        )
        expect = base_scores / np.sqrt(1.0 + n_chars.astype(np.float64))
        order = np.lexsort((base_docs, -expect))[:25]
        assert docs.tolist() == base_docs[order].tolist()
        np.testing.assert_allclose(scores, expect[order], rtol=0, atol=0)

    def test_registry_extension(self, base_index):
        def kernel(cols, bm25):
            return bm25 * 0.0 + cols["n_chars"].astype(np.float64)

        SCORE_SCRIPTS["by_len"] = lambda: ScoreScript(
            "by_len", ("n_chars",), kernel
        )
        s = IndexSearcher(base_index)
        docs, scores = s.search_script_score(
            ["data"], SCORE_SCRIPTS["by_len"](), k=5
        )
        got = s.field_values(docs, "n_chars").to_numpy(zero_copy_only=False)
        np.testing.assert_array_equal(scores, got.astype(np.float64))
        SCORE_SCRIPTS.pop("by_len")


def _ref_intervals(toks, terms, max_gaps):
    """Brute-force minimal-interval tf: enumerate every window, keep
    windows containing all terms, drop windows containing a smaller
    qualifying window, then gap-filter."""
    n = len(terms)
    wins = []
    for i in range(len(toks)):
        for j in range(i, len(toks)):
            if all(t in toks[i : j + 1] for t in terms):
                wins.append((i, j))
                break  # larger j only loosens; (i, j) is tightest for i
    minimal = [
        (i, j)
        for (i, j) in wins
        if not any(
            (i2, j2) != (i, j) and i2 >= i and j2 <= j for (i2, j2) in wins
        )
    ]
    return sum(1 for (i, j) in minimal if (j - i + 1) - n <= max_gaps)


class TestIntervals:
    CASES = [
        (["data", "query", "table"], 4),
        (["merge", "sort", "window"], 2),
        (["scan", "filter"], 1),
        (["the", "a", "key", "row"], 6),
    ]

    @pytest.mark.parametrize("terms,max_gaps", CASES)
    def test_matches_bruteforce(self, pos_index, sf_dir, terms, max_gaps):
        s = IndexSearcher(pos_index)
        corpus = _corpus(sf_dir)
        expect = {
            d: tf
            for d, toks in corpus.items()
            if (tf := _ref_intervals(toks, terms, max_gaps)) > 0
        }
        docs, scores = s.search_intervals(
            terms, k=len(corpus), max_gaps=max_gaps
        )
        assert set(docs.tolist()) == set(expect)
        # identical tf ⇒ identical score per doc (same idf/dl chain):
        # recompute engine tf via the score inverse is fragile; instead
        # assert rank-equality of equal-tf groups by checking scores are
        # monotone in the reference tf for fixed dl is overkill — the
        # SQL oracle pins exact scores; here membership + determinism
        d2, s2 = s.search_intervals(terms, k=len(corpus), max_gaps=max_gaps)
        assert d2.tolist() == docs.tolist() and s2.tolist() == scores.tolist()

    def test_validation(self, pos_index):
        s = IndexSearcher(pos_index)
        with pytest.raises(ValueError):
            s.search_intervals(["data"], max_gaps=1)
        with pytest.raises(ValueError):
            s.search_intervals(["data", "query"], max_gaps=-1)

    def test_absent_term_empty(self, pos_index):
        s = IndexSearcher(pos_index)
        docs, _ = s.search_intervals(["data", "zzznope"], max_gaps=9)
        assert docs.size == 0


class TestSpanFirst:
    @pytest.mark.parametrize("term,end", [("data", 3), ("the", 1), ("scan", 5)])
    def test_matches_bruteforce(self, pos_index, sf_dir, term, end):
        s = IndexSearcher(pos_index)
        corpus = _corpus(sf_dir)
        expect = {
            d: sum(1 for p, t in enumerate(toks) if t == term and p < end)
            for d, toks in corpus.items()
        }
        expect = {d: c for d, c in expect.items() if c}
        docs, _ = s.search_span_first(term, end, k=len(corpus))
        assert set(docs.tolist()) == set(expect)

    def test_end_zero_empty(self, pos_index):
        s = IndexSearcher(pos_index)
        docs, _ = s.search_span_first("data", 0)
        assert docs.size == 0


class TestSlicedPages:
    def test_pages_match_per_slice_search_after(self, sf_dir, ray_session):
        from neural_search_ray.rank.paging import search_after, sliced_pages

        n_slices, size, pages = 3, 7, 2
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
        )
        out = sliced_pages(
            ds, "event_id", n_slices, [("ts", "asc"), ("event_id", "asc")],
            size, pages,
        ).take_all()
        by_slice = {}
        for r in out:
            by_slice.setdefault(r["slice_id"], []).append(r)
        assert set(by_slice) == set(range(n_slices))
        for sl, rows in by_slice.items():
            rows.sort(key=lambda r: r["rank"])
            # slice membership + rank/page bookkeeping
            assert all(r["event_id"] % n_slices == sl for r in rows)
            assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
            assert all(
                r["page"] == (r["rank"] - 1) // size + 1 for r in rows
            )
            # page 1 of this slice == what search_after would serve it
            def only_slice(batch: pa.Table) -> pa.Table:
                ids = batch["event_id"].to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(ids % n_slices == sl))

            ref = search_after(
                ds.map_batches(only_slice, batch_format="pyarrow"),
                [("ts", "asc"), ("event_id", "asc")],
                None,
                size,
            ).take_all()
            assert [r["event_id"] for r in rows[:size]] == [
                r["event_id"] for r in ref
            ]

    def test_desc_timestamp_key(self, sf_dir, ray_session):
        """Regression: a DESC key on a timestamp column must not crash
        (datetime64 has no negative ufunc — ordered via int64 view)."""
        from neural_search_ray.rank.paging import sliced_pages

        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
        )
        out = sliced_pages(
            ds, "event_id", 2, [("ts", "desc"), ("event_id", "asc")], 3, 1
        ).take_all()
        ts = {
            r["event_id"]: r["ts"]
            for r in ds.take_all()
        }
        by_slice = {}
        for r in sorted(out, key=lambda r: r["rank"]):
            by_slice.setdefault(r["slice_id"], []).append(ts[r["event_id"]])
        for sl, got in by_slice.items():
            assert got == sorted(got, reverse=True)
            # page 1 really is the newest 3 of the slice
            all_sl = sorted(
                (v for k, v in ts.items() if k % 2 == sl), reverse=True
            )
            assert got == all_sl[: len(got)]

    def test_validation(self, sf_dir, ray_session):
        from neural_search_ray.rank.paging import sliced_pages

        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
        )
        with pytest.raises(ValueError):
            sliced_pages(ds, "event_id", 0, [("ts", "asc")], 5, 1)


class TestSpanNot:
    @pytest.mark.parametrize(
        "inc,exc,pre,post",
        [("data", "query", 1, 1), ("merge", "sort", 0, 2), ("the", "fast", 2, 0)],
    )
    def test_matches_bruteforce(self, pos_index, sf_dir, inc, exc, pre, post):
        s = IndexSearcher(pos_index)
        corpus = _corpus(sf_dir)
        expect = {}
        for d, toks in corpus.items():
            exc_pos = {p for p, t in enumerate(toks) if t == exc}
            c = sum(
                1
                for p, t in enumerate(toks)
                if t == inc
                and not any(q in exc_pos for q in range(p - pre, p + post + 1))
            )
            if c:
                expect[d] = c
        docs, _ = s.search_span_not(inc, exc, k=len(corpus), pre=pre, post=post)
        assert set(docs.tolist()) == set(expect)

    def test_no_exclude_equals_single_term(self, pos_index):
        s = IndexSearcher(pos_index)
        d1, s1 = s.search_span_not("data", "zzznope", k=50)
        d2, s2 = s.search_bm25(["data"], k=50)
        assert d1.tolist() == d2.tolist()
        # 1-ulp: search_bm25 scales precomputed tf-norms, span_not
        # computes idf*f/(f+norm) inline — different float op order
        np.testing.assert_allclose(s1, s2, rtol=1e-12)

    def test_validation(self, pos_index):
        with pytest.raises(ValueError):
            IndexSearcher(pos_index).search_span_not("a", "b", pre=-1)


class TestLMSimilarities:
    def _ref(self, sf_dir, terms, similarity, mu=2000.0, lam=0.5):
        corpus = _corpus(sf_dir)
        total = sum(len(t) for t in corpus.values())
        cf = {t: sum(toks.count(t) for toks in corpus.values()) for t in terms}
        out = {}
        for d, toks in corpus.items():
            sc = 0.0
            hit = False
            for t in sorted(set(terms)):
                tf = toks.count(t)
                if tf == 0 or cf[t] == 0:
                    continue
                hit = True
                p_c = cf[t] / total
                dl = len(toks)
                if similarity == "dirichlet":
                    sc += max(
                        0.0,
                        np.log(1.0 + tf / (mu * p_c))
                        + np.log(mu / (dl + mu)),
                    )
                elif similarity == "dfi":
                    e = cf[t] * dl / total
                    if tf > e:
                        sc += np.log2(1.0 + (tf - e) / np.sqrt(e))
                else:
                    sc += np.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * p_c))
            if hit:
                out[d] = sc
        return out

    @pytest.mark.parametrize("similarity", ["dirichlet", "jelinek_mercer", "dfi"])
    def test_matches_bruteforce(self, base_index, sf_dir, similarity):
        s = IndexSearcher(base_index)
        terms = tokenize("data query table")
        docs, scores = s.search_lm(
            terms, k=10_000, similarity=similarity
        )
        ref = self._ref(sf_dir, terms, similarity)
        assert set(docs.tolist()) == set(ref)
        got = dict(zip(docs.tolist(), scores.tolist()))
        for d, v in ref.items():
            np.testing.assert_allclose(got[d], v, rtol=1e-12)

    def test_dirichlet_clamp_nonnegative(self, base_index):
        s = IndexSearcher(base_index)
        # 'the' is stopword-grade: high cf makes the unclamped Dirichlet
        # term negative for short docs — scores must still be >= 0
        _, scores = s.search_lm(["the"], k=10_000, similarity="dirichlet")
        assert np.all(scores >= 0.0)

    def test_unknown_similarity(self, base_index):
        with pytest.raises(ValueError):
            IndexSearcher(base_index).search_lm(["data"], similarity="bm42")


class TestReindex:
    """index/reindex.py — the _reindex API: live-doc view, query match
    selection, ingest script, fresh stats, resume, config inheritance."""

    def test_reindex_full_fidelity(self, base_index, sf_dir, tmp_path, ray_session):
        """No query, no script, no deletes: the destination must be
        rank- AND score-identical to the source (same corpus, same
        config inherited from the source manifest)."""
        from neural_search_ray.index.reindex import reindex

        dst = str(tmp_path / "ri_full")
        reindex(base_index, dst, _docs_ds(sf_dir))
        s0, s1 = IndexSearcher(base_index), IndexSearcher(dst)
        for q in ("data query", "fast join", "slow group agg"):
            d0, v0 = s0.search_bm25(tokenize(q), k=20)
            d1, v1 = s1.search_bm25(tokenize(q), k=20)
            assert d0.tolist() == d1.tolist()
            np.testing.assert_allclose(v0, v1, rtol=1e-12)

    def test_reindex_respects_tombstones_and_query(
        self, base_index, sf_dir, tmp_path, ray_session
    ):
        """Tombstoned docs never cross; with query_terms only the match
        set is copied; destination stats are FRESH (n_docs = copied)."""
        from neural_search_ray.index.deletes import delete_by_query
        from neural_search_ray.index.manifest import IndexManifest
        from neural_search_ray.index.reindex import reindex

        src = str(tmp_path / "ri_src")
        shutil.copytree(base_index, src, copy_function=shutil.copy)
        delete_by_query(src, ["dup"])
        live_searcher = IndexSearcher(src)
        matched = set(live_searcher.match_docs(["data"]).tolist())
        dropped = set(IndexSearcher(base_index).match_docs(["dup"]).tolist())

        dst = str(tmp_path / "ri_dst")
        m = reindex(src, dst, _docs_ds(sf_dir), query_terms=["data"])
        want = matched - dropped
        assert m.n_docs == len(want)
        s = IndexSearcher(dst)
        got = set(s.match_docs(["data"]).tolist())
        assert got == want
        assert not (set(s.match_docs(["dup"]).tolist()) & dropped)

    def test_reindex_script_and_resume(self, base_index, sf_dir, tmp_path, ray_session):
        """The ingest script transforms every copied doc; re-running the
        same reindex is a resume no-op (segment already complete)."""
        import pyarrow.compute as pc

        from neural_search_ray.index.reindex import reindex

        def add_tag(batch: pa.Table) -> pa.Table:
            text = pc.binary_join_element_wise(
                batch["text"],
                pa.array(["xtagx"] * len(batch), type=pa.string()),
                " ",
            )
            return pa.table({"doc_id": batch["doc_id"], "text": text})

        dst = str(tmp_path / "ri_tag")
        m1 = reindex(base_index, dst, _docs_ds(sf_dir), script=add_tag)
        s = IndexSearcher(dst)
        # every copied doc contains the injected tag
        assert set(s.match_docs(["xtagx"]).tolist()) == set(
            _corpus(sf_dir).keys()
        )
        m2 = reindex(base_index, dst, _docs_ds(sf_dir), script=add_tag)
        assert m2.segments.keys() == m1.segments.keys()

    def test_reindex_missing_source(self, tmp_path, sf_dir, ray_session):
        from neural_search_ray.index.reindex import reindex

        with pytest.raises(ValueError, match="manifest"):
            reindex(str(tmp_path / "nope"), str(tmp_path / "o"), _docs_ds(sf_dir))
