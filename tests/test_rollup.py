"""Index-rollup job + rollup search (agg/rollup.py)."""

import os
import shutil

import duckdb
import numpy as np
import pytest

from neural_search_ray.agg.rollup import (
    SUCCESS_MARKER,
    build_rollup,
    rollup_aggregate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rollup_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rollup") / "hourly")
    build_rollup(f"{SF}/events.parquet", out, interval="hour")
    return out


class TestBuild:
    def test_marker_written_last(self, rollup_dir):
        assert os.path.exists(os.path.join(rollup_dir, SUCCESS_MARKER))
        assert os.listdir(os.path.join(rollup_dir, "data"))

    def test_resume_skips(self, rollup_dir):
        marker = os.path.join(rollup_dir, SUCCESS_MARKER)
        before = os.path.getmtime(marker)
        assert build_rollup(
            f"{SF}/events.parquet", rollup_dir, interval="hour"
        ) == rollup_dir
        assert os.path.getmtime(marker) == before  # untouched

    def test_bad_interval(self, tmp_path):
        with pytest.raises(ValueError):
            build_rollup(
                f"{SF}/events.parquet", str(tmp_path / "x"), interval="week"
            )

    def test_hourly_matches_raw(self, rollup_dir):
        got = (
            rollup_aggregate(rollup_dir, coarse="hour")
            .to_pandas()
            .sort_values(["event_type", "bucket_us"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        want = con.execute(
            f"""SELECT event_type,
                       epoch_us(date_trunc('hour', ts))::BIGINT AS bucket_us,
                       count(*)::BIGINT AS cnt, sum(value) AS sum_value,
                       min(value) AS min_value, max(value) AS max_value
                FROM read_parquet('{SF}/events.parquet')
                GROUP BY 1, 2 ORDER BY 1, 2"""
        ).fetchdf()
        assert len(got) == len(want)
        assert (got["cnt"].values == want["cnt"].values).all()
        np.testing.assert_array_equal(
            got["min_value"].values, want["min_value"].values
        )
        np.testing.assert_array_equal(
            got["max_value"].values, want["max_value"].values
        )
        np.testing.assert_allclose(
            got["sum_value"].values, want["sum_value"].values, rtol=1e-12
        )

    def test_rollup_is_smaller_than_raw(self, rollup_dir):
        import pyarrow.parquet as pq

        raw = pq.read_metadata(f"{SF}/events.parquet").num_rows
        ddir = os.path.join(rollup_dir, "data")
        rolled = sum(
            pq.read_metadata(os.path.join(ddir, f)).num_rows
            for f in os.listdir(ddir)
            if f.endswith(".parquet")
        )
        assert 0 < rolled < raw


class TestDayRebucket:
    def test_day_buckets_align(self, rollup_dir):
        day_us = 86_400_000_000
        got = rollup_aggregate(rollup_dir, coarse="day").to_pandas()
        assert (got["bucket_us"].values % day_us == 0).all()

    def test_counts_conserved(self, rollup_dir):
        hourly = rollup_aggregate(rollup_dir, coarse="hour").to_pandas()
        daily = rollup_aggregate(rollup_dir, coarse="day").to_pandas()
        assert hourly["cnt"].sum() == daily["cnt"].sum()
        # min/max fold: global extremes survive any re-bucketing
        assert hourly["min_value"].min() == daily["min_value"].min()
        assert hourly["max_value"].max() == daily["max_value"].max()

    def test_incomplete_rollup_not_trusted(self, rollup_dir, tmp_path):
        broken = str(tmp_path / "broken")
        shutil.copytree(rollup_dir, broken)
        os.remove(os.path.join(broken, SUCCESS_MARKER))
        # a re-run without the marker rebuilds from scratch — the stale
        # partial data must not double-count
        build_rollup(f"{SF}/events.parquet", broken, interval="hour")
        assert os.path.exists(os.path.join(broken, SUCCESS_MARKER))
        a = rollup_aggregate(rollup_dir, coarse="hour").to_pandas()
        b = rollup_aggregate(broken, coarse="hour").to_pandas()
        assert a["cnt"].sum() == b["cnt"].sum()
