"""Scripted-metric aggregation (agg/scripted.py + engine/distributed)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from neural_search_ray.agg.scripted import (
    SCRIPTED_METRICS,
    ScriptedMetric,
    scripted_metric_by_key,
)

SF = "/root/testdata/sf0.001"


class TestScripts:
    def test_clipped_sum_math(self):
        s = SCRIPTED_METRICS["clipped_sum"]("v", 10)
        st1 = s.map_batch({"v": np.array([3, 15, 9])})
        st2 = s.map_batch({"v": np.array([20])})
        out = s.reduce(s.combine([st1, st2]))
        assert out == {"clipped_sum": 3 + 10 + 9 + 10, "doc_count": 4}

    def test_combine_associative(self):
        s = SCRIPTED_METRICS["clipped_sum"]("v", 5)
        parts = [
            s.map_batch({"v": np.array([x])}) for x in (1, 7, 3, 9, 2)
        ]
        left = s.combine([s.combine(parts[:2]), s.combine(parts[2:])])
        right = s.combine(parts)
        assert left == right

    def test_rms_cents_exact_int_state(self):
        s = SCRIPTED_METRICS["rms_cents"]("v")
        st = s.map_batch({"v": np.array([1.115, 2.0])})
        # 1.115 -> 112 cents (half-up), 2.0 -> 200
        assert st == (112 * 112 + 200 * 200, 2)
        out = s.reduce(st)
        assert out["doc_count"] == 2
        assert out["rms"] == pytest.approx(
            np.sqrt((112**2 + 200**2) / 2) / 100, abs=1e-6
        )

    def test_registry_extension(self):
        # the extension surface: register a custom script, use it
        def factory(field):
            return ScriptedMetric(
                (field,),
                lambda c: int(c[field].max()),
                lambda states: max(states),
                lambda st: {"max_v": st},
                ("max_v",),
            )

        SCRIPTED_METRICS["my_max"] = factory
        try:
            s = SCRIPTED_METRICS["my_max"]("v")
            st = s.combine(
                [s.map_batch({"v": np.array([4, 9])}),
                 s.map_batch({"v": np.array([7])})]
            )
            assert s.reduce(st) == {"max_v": 9}
        finally:
            del SCRIPTED_METRICS["my_max"]


class TestDatasetPath:
    def test_by_key_matches_sql(self, ray_session):
        ds = ray.data.read_parquet(
            f"{SF}/events.parquet", columns=["event_type", "value"]
        )
        got = (
            scripted_metric_by_key(
                ds, "event_type", SCRIPTED_METRICS["rms_cents"]("value")
            )
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(
                f"""SELECT event_type, count(*)::BIGINT AS doc_count,
                       round(sqrt(sum(CAST(round(value*100,0) AS BIGINT)
                                      * CAST(round(value*100,0) AS BIGINT))
                                  / count(*)) / 100, 6) AS rms
                FROM read_parquet('{SF}/events.parquet')
                GROUP BY event_type ORDER BY event_type"""
            )
            .df()
            .reset_index(drop=True)
        )
        assert list(got["event_type"]) == list(want["event_type"])
        assert (got["doc_count"].to_numpy() == want["doc_count"].to_numpy()).all()
        assert np.allclose(got["rms"], want["rms"], atol=1e-9)

    def test_empty_batch_schema(self):
        s = SCRIPTED_METRICS["clipped_sum"]("value", 10)
        ds = ray.data.from_arrow(
            pa.table(
                {"event_type": pa.array([], pa.string()),
                 "value": pa.array([], pa.int64())}
            )
        )
        assert scripted_metric_by_key(ds, "event_type", s).count() == 0


class TestEnginePaths:
    @pytest.fixture(scope="class")
    def sf001_searcher(self, ray_session):
        from neural_search_ray.pipelines.suite import (
            _ensure_docvalues,
            get_searcher,
        )

        _ensure_docvalues(SF)
        return get_searcher(SF)

    def test_engine_matches_docvalues(self, sf001_searcher):
        # full SQL parity lives in the agg_scripted_metric oracle entry;
        # here: the engine result == recomputing over its own match set
        from neural_search_ray.analysis.analyzer import tokenize

        script = SCRIPTED_METRICS["clipped_sum"]("n_chars", 320)
        got = sf001_searcher.agg_scripted_metric(tokenize("data"), script)
        assert got["doc_count"] > 0
        docs = sf001_searcher._match_union(sorted(set(tokenize("data"))))
        vals = (
            sf001_searcher.field_values(docs, "n_chars")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        assert got["clipped_sum"] == int(np.minimum(vals, 320).sum())
        assert got["doc_count"] == int(vals.size)

    def test_empty_match(self, sf001_searcher):
        script = SCRIPTED_METRICS["clipped_sum"]("n_chars", 320)
        got = sf001_searcher.agg_scripted_metric(["zzzqqqxxx"], script)
        assert got == {"clipped_sum": None, "doc_count": None}

    def test_distributed_equals_single(self, sf001_searcher):
        from neural_search_ray.analysis.analyzer import tokenize
        from neural_search_ray.pipelines.suite import get_index_dir
        from neural_search_ray.query.distributed import DistributedSearcher

        script = SCRIPTED_METRICS["clipped_sum"]("n_chars", 320)
        dsearch = DistributedSearcher(get_index_dir(SF), num_actors=2)
        try:
            for q in ("data", "search table", "zzzqqqxxx"):
                single = sf001_searcher.agg_scripted_metric(
                    tokenize(q), script
                )
                dist = dsearch.agg_scripted_metric(tokenize(q), script)
                assert single == dist
        finally:
            dsearch.shutdown()
