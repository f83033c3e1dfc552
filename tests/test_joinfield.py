"""Parent-child join field (stages/joinfield.py): has_child score
modes + children gates, has_parent broadcast inheritance, inner_hits
per-parent top-k — each against a pandas brute-force reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from neural_search_ray.stages.joinfield import (
    child_scores,
    has_child,
    has_parent,
    inner_hits,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(ray_session):
    return pq.read_table(f"{SF}/lineitem.parquet").to_pandas()


def _children_ds(n_blocks=8):
    def flt(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        kept = batch.filter(pa.array(q >= 40.0))
        rev = kept["l_extendedprice"].to_numpy(zero_copy_only=False) * (
            1.0 - kept["l_discount"].to_numpy(zero_copy_only=False)
        )
        return pa.table(
            {"l_orderkey": kept["l_orderkey"], "_rev": pa.array(rev)}
        )

    return (
        ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        )
        .repartition(n_blocks)
        .map_batches(flt, batch_format="pyarrow")
    )


def _ref(li):
    m = li[li.l_quantity >= 40.0].copy()
    m["rev"] = m.l_extendedprice * (1.0 - m.l_discount)
    return m


class TestChildScores:
    @pytest.mark.parametrize("mode", ["max", "min", "sum", "avg", "none"])
    def test_modes_match_pandas(self, li, ray_session, mode):
        got = {
            r["l_orderkey"]: (r["child_score"], r["n_children"])
            for r in child_scores(
                _children_ds(), key_col="l_orderkey", score_col="_rev",
                score_mode=mode,
            ).take_all()
        }
        ref = _ref(li).groupby("l_orderkey")["rev"]
        exp = {
            "max": ref.max(), "min": ref.min(), "sum": ref.sum(),
            "avg": ref.mean(), "none": ref.max() * 0 + 1.0,
        }[mode]
        cnt = _ref(li).groupby("l_orderkey").size()
        assert set(got) == set(exp.index)
        for k, (s, n) in got.items():
            assert n == cnt[k]
            np.testing.assert_allclose(s, exp[k], rtol=1e-12)

    def test_children_gates(self, li, ray_session):
        got = child_scores(
            _children_ds(), key_col="l_orderkey", score_col="_rev",
            score_mode="max", min_children=2, max_children=3,
        ).take_all()
        cnt = _ref(li).groupby("l_orderkey").size()
        exp_keys = set(cnt[(cnt >= 2) & (cnt <= 3)].index)
        assert {r["l_orderkey"] for r in got} == exp_keys

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            child_scores(
                _children_ds(), key_col="l_orderkey", score_col="_rev",
                score_mode="median",
            )
        with pytest.raises(ValueError):
            child_scores(
                _children_ds(), key_col="l_orderkey", score_col="_rev",
                min_children=0,
            )


class TestHasChild:
    def test_join_attaches_parent_payload(self, li, ray_session):
        parents = ray.data.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )
        got = has_child(
            parents, _children_ds(),
            parent_key="o_orderkey", child_key="l_orderkey",
            score_col="_rev", score_mode="max", min_children=2,
        ).take_all()
        ref = _ref(li).groupby("l_orderkey").agg(
            mx=("rev", "max"), n=("rev", "size")
        )
        ref = ref[ref.n >= 2]
        assert {r["o_orderkey"] for r in got} == set(ref.index)
        orders = pq.read_table(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        ).to_pandas().set_index("o_orderkey")
        for r in got[:50]:
            k = r["o_orderkey"]
            assert r["child_score"] == ref.mx[k]
            assert r["n_children"] == ref.n[k]
            assert r["o_orderpriority"] == orders.o_orderpriority[k]

    def test_broadcast_matches_join(self, ray_session):
        parents = ray.data.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        )

        def run(broadcast):
            rows = has_child(
                parents, _children_ds(),
                parent_key="o_orderkey", child_key="l_orderkey",
                score_col="_rev", score_mode="avg", min_children=2,
                broadcast=broadcast,
            ).take_all()
            return sorted(
                (
                    r["o_orderkey"], r["o_orderpriority"],
                    r["child_score"], r["n_children"],
                )
                for r in rows
            )

        assert run(True) == run(False)


class TestHasParent:
    def test_score_inherited(self, li, ray_session):
        o = pq.read_table(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        tp = o["o_totalprice"].to_numpy(zero_copy_only=False)
        matched = o.filter(pa.array(tp > 200_000.0))
        children = ray.data.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
        ).repartition(6)
        got = has_parent(
            children, matched,
            parent_key="o_orderkey", child_key="l_orderkey",
            parent_score_col="o_totalprice",
        ).take_all()
        odf = o.to_pandas().set_index("o_orderkey")
        exp = li[li.l_orderkey.isin(
            odf[odf.o_totalprice > 200_000.0].index
        )]
        assert len(got) == len(exp)
        for r in got[:50]:
            assert r["parent_score"] == odf.o_totalprice[r["l_orderkey"]]

    def test_constant_score_and_empty(self, ray_session):
        children = ray.data.read_parquet(
            f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
        )
        some = pa.table({"o_orderkey": pa.array([1, 3], pa.int64())})
        got = has_parent(
            children, some,
            parent_key="o_orderkey", child_key="l_orderkey", score=False,
        ).take_all()
        assert all(r["parent_score"] == 1.0 for r in got)
        assert {r["l_orderkey"] for r in got} <= {1, 3}
        none = pa.table({"o_orderkey": pa.array([], pa.int64())})
        assert (
            has_parent(
                children, none,
                parent_key="o_orderkey", child_key="l_orderkey",
                score=False,
            ).count()
            == 0
        )
        with pytest.raises(ValueError):
            has_parent(
                children, some,
                parent_key="o_orderkey", child_key="l_orderkey", score=True,
            )


class TestInnerHits:
    def test_top_children_per_parent(self, li, ray_session):
        ref = _ref(li)
        # parents with the most matching children — stress the prune
        keys = (
            ref.groupby("l_orderkey").size().sort_values(ascending=False)
            .index[:5].to_numpy()
        )

        def with_line(batch: pa.Table) -> pa.Table:
            q = batch["l_quantity"].to_numpy(zero_copy_only=False)
            kept = batch.filter(pa.array(q >= 40.0))
            rev = kept["l_extendedprice"].to_numpy(
                zero_copy_only=False
            ) * (1.0 - kept["l_discount"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "l_orderkey": kept["l_orderkey"],
                    "l_linenumber": kept["l_linenumber"],
                    "_rev": pa.array(rev),
                }
            )

        children = (
            ray.data.read_parquet(
                f"{SF}/lineitem.parquet",
                columns=[
                    "l_orderkey", "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount",
                ],
            )
            .repartition(8)
            .map_batches(with_line, batch_format="pyarrow")
        )
        got = inner_hits(
            children, keys, child_key="l_orderkey", score_col="_rev",
            size=2, tiebreak_cols=("l_linenumber",),
        ).take_all()
        by_parent = {}
        for r in sorted(got, key=lambda r: (r["l_orderkey"], r["rank"])):
            by_parent.setdefault(r["l_orderkey"], []).append(r)
        assert set(by_parent) == set(keys.tolist())
        m = ref[ref.l_orderkey.isin(keys)]
        li_m = li[li.l_quantity >= 40.0]
        for k, rows in by_parent.items():
            exp = (
                li_m[li_m.l_orderkey == k]
                .assign(rev=lambda d: d.l_extendedprice * (1 - d.l_discount))
                .sort_values(
                    ["rev", "l_linenumber"], ascending=[False, True]
                )
                .head(2)
            )
            assert [r["rank"] for r in rows] == list(
                range(1, len(rows) + 1)
            )
            assert [r["l_linenumber"] for r in rows] == list(
                exp.l_linenumber
            )
            np.testing.assert_allclose(
                [r["_rev"] for r in rows], list(exp.rev), rtol=0
            )
        assert m is not None
