"""Nested documents (stages/nested.py): block-join query score modes,
child-scope terms agg, reverse_nested parent counts — against a
brute-force replay of the fixture contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from neural_search_ray.stages.nested import (
    add_nested_column,
    nested_query,
    nested_terms_agg,
    reverse_nested_count,
)

SF = "/root/testdata/sf0.001"


def _children():
    """Brute-force replay of the add_nested_column fixture contract."""
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy().astype(np.int64)
    rows = []
    for d in ids.tolist():
        for i in range(d % 3 + 1):
            rows.append((d, f"u{(d * 7 + i * 3) % 20}", (d * 13 + i * 5) % 6))
    return rows


def _nds():
    return add_nested_column(
        ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    ).repartition(6)


class TestFixture:
    def test_contract(self, ray_session):
        got = _nds().take(5)
        want = _children()
        by_doc = {}
        for d, a, s in want:
            by_doc.setdefault(d, []).append({"author": a, "stars": s})
        for r in got:
            assert r["comments"] == by_doc[r["doc_id"]], r["doc_id"]


class TestNestedQuery:
    @pytest.mark.parametrize("mode", ["sum", "max", "avg", "none"])
    def test_matches_bruteforce(self, ray_session, mode):
        ch = _children()
        per = {}
        for d, a, s in ch:
            if a == "u5" and s >= 4:
                per.setdefault(d, []).append(s)
        folds = {
            "sum": lambda v: float(sum(v)),
            "max": lambda v: float(max(v)),
            "avg": lambda v: sum(v) / len(v),
            "none": lambda v: 1.0,
        }
        want = sorted(
            ((folds[mode](v), d) for d, v in per.items()),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        t = nested_query(
            _nds(), author="u5", min_stars=4, score_mode=mode, k=10
        )
        got = list(zip(t["score"].to_pylist(), t["doc_id"].to_pylist()))
        assert got == want, mode

    def test_same_object_semantics(self, ray_session):
        """A parent whose children are (u5, low) and (other, high) must
        NOT match — the condition applies to the SAME child object."""
        ch = _children()
        per_doc = {}
        for d, a, s in ch:
            per_doc.setdefault(d, []).append((a, s))
        flat_wrong = {
            d
            for d, cs in per_doc.items()
            if any(a == "u5" for a, _ in cs)
            and any(s >= 4 for _, s in cs)
        }
        strict = {
            d
            for d, cs in per_doc.items()
            if any(a == "u5" and s >= 4 for a, s in cs)
        }
        assert strict < flat_wrong, "fixture must discriminate the modes"
        t = nested_query(
            _nds(), author="u5", min_stars=4, score_mode="none", k=10**6
        )
        assert set(t["doc_id"].to_pylist()) == strict

    def test_validation(self, ray_session):
        with pytest.raises(ValueError, match="score_mode"):
            nested_query(_nds(), author="u5", min_stars=0, score_mode="x")
        with pytest.raises(ValueError, match="k"):
            nested_query(_nds(), author="u5", min_stars=0, k=0)

    def test_unknown_author_empty(self, ray_session):
        t = nested_query(_nds(), author="nope", min_stars=0, k=5)
        assert len(t) == 0


class TestNestedAggs:
    def test_terms_child_counts(self, ray_session):
        from collections import Counter

        cnt = Counter(a for _, a, _ in _children())
        want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:10]
        t = nested_terms_agg(_nds(), size=10)
        got = list(zip(t["author"].to_pylist(), t["child_count"].to_pylist()))
        assert got == want

    def test_reverse_nested_parent_counts(self, ray_session):
        from collections import Counter

        cnt = Counter({})
        seen = {(d, a) for d, a, _ in _children()}
        cnt = Counter(a for _, a in seen)
        want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:10]
        t = reverse_nested_count(_nds(), size=10)
        got = list(
            zip(t["author"].to_pylist(), t["parent_count"].to_pylist())
        )
        assert got == want
        # parent counts never exceed child counts
        child = dict(Counter(a for _, a, _ in _children()))
        for a, n in got:
            assert n <= child[a]
