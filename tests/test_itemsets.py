"""frequent_item_sets aggregation (agg/itemsets.py)."""

from itertools import combinations

import pyarrow as pa
import pytest
import ray.data

from neural_search_ray.agg.itemsets import frequent_item_sets

DOCS = [
    "a b c",
    "a b",
    "a c d",
    "b c a",
    "d e",
    "a b e",
    "x",
    "",
]


def _ds_factory():
    def make():
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS, pa.string()),
        }))
    return make


def _brute(min_support):
    counts = {}
    for text in DOCS:
        toks = sorted(set(text.split()))
        for a, b in combinations(toks, 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return {k: v for k, v in counts.items() if v >= min_support}


class TestFrequentItemSets:
    def test_matches_bruteforce(self, ray_session):
        t = frequent_item_sets(_ds_factory(), min_support=2, size=100)
        got = {
            (r["item_a"], r["item_b"]): r["support"] for r in t.to_pylist()
        }
        assert got == _brute(2)

    def test_ordering_and_size_cap(self, ray_session):
        t = frequent_item_sets(_ds_factory(), min_support=2, size=2)
        rows = t.to_pylist()
        assert len(rows) == 2
        sups = [r["support"] for r in rows]
        assert sups == sorted(sups, reverse=True)
        # top pair is (a, b) with support 4
        assert (rows[0]["item_a"], rows[0]["item_b"]) == ("a", "b")
        assert rows[0]["support"] == 4

    def test_high_support_empty(self, ray_session):
        t = frequent_item_sets(_ds_factory(), min_support=50, size=10)
        assert t.num_rows == 0

    def test_duplicate_tokens_count_once(self, ray_session):
        def make():
            return ray.data.from_arrow(pa.table({
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a b b a", "b a"], pa.string()),
            }))
        t = frequent_item_sets(make, min_support=2, size=10)
        rows = t.to_pylist()
        assert rows == [{"item_a": "a", "item_b": "b", "support": 2}]

    def test_bad_min_support(self, ray_session):
        with pytest.raises(ValueError):
            frequent_item_sets(_ds_factory(), min_support=0)
