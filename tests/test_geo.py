"""Geo family (stages/geo.py): bounding box, haversine distance sort,
geohash grid — against brute-force numpy references and a known-value
geohash check."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from neural_search_ray.stages.geo import (
    add_geo_columns,
    geo_bounding_box,
    geo_distance_topk,
    geohash_encode,
    geohash_grid,
    haversine_km,
)

SF = "/root/testdata/sf0.001"


def _pts():
    ids = pq.read_table(f"{SF}/events.parquet", columns=["event_id"])[
        "event_id"
    ].to_numpy().astype(np.int64)
    lat = (ids * 7919 % 18000).astype(np.float64) / 100.0 - 90.0
    lon = (ids * 104729 % 36000).astype(np.float64) / 100.0 - 180.0
    return ids, lat, lon


def _geo_ds():
    return add_geo_columns(
        ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_id"])
    ).repartition(6)


class TestBoundingBox:
    def test_matches_numpy(self, ray_session):
        got = geo_bounding_box(
            _geo_ds(), top=40.0, left=-10.0, bottom=-40.0, right=90.0
        ).take_all()
        ids, lat, lon = _pts()
        m = (lat >= -40.0) & (lat <= 40.0) & (lon >= -10.0) & (lon <= 90.0)
        assert {r["event_id"] for r in got} == set(ids[m].tolist())
        for r in got[:20]:
            assert -40.0 <= r["lat"] <= 40.0
            assert -10.0 <= r["lon"] <= 90.0

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            geo_bounding_box(_geo_ds(), top=0, left=0, bottom=10, right=1)
        with pytest.raises(ValueError):
            geo_bounding_box(_geo_ds(), top=10, left=5, bottom=0, right=1)


class TestDistanceTopk:
    def test_matches_brute_force(self, ray_session):
        qlat, qlon = 12.3456, 56.789
        got = geo_distance_topk(_geo_ds(), lat=qlat, lon=qlon, k=15)
        ids, lat, lon = _pts()
        d = haversine_km(lat, lon, qlat, qlon)
        order = np.lexsort((ids, d))[:15]
        assert got["event_id"].to_pylist() == ids[order].tolist()
        np.testing.assert_array_equal(
            got["distance_km"].to_numpy(), d[order]
        )

    def test_haversine_known_value(self):
        # Paris -> NYC great-circle ~5837 km
        d = haversine_km(
            np.array([48.8566]), np.array([2.3522]), 40.7128, -74.0060
        )
        assert 5800 < d[0] < 5880

    def test_tie_break_on_duplicate_coords(self, ray_session):
        # rows with identical coordinates must rank by id — build a tiny
        # dataset where every point is the same
        t = pa.table(
            {
                "event_id": pa.array([5, 1, 9, 3], pa.int64()),
                "lat": pa.array([10.0] * 4),
                "lon": pa.array([20.0] * 4),
            }
        )
        ds = ray.data.from_arrow(t).repartition(2)
        got = geo_distance_topk(ds, lat=0.0, lon=0.0, k=3)
        assert got["event_id"].to_pylist() == [1, 3, 5]


class TestGeohash:
    def test_known_cells(self):
        # canonical geohash: (57.64911, 10.40744) -> u4pruydqqvj
        gh = geohash_encode(
            np.array([57.64911]), np.array([10.40744]), precision=5
        )
        assert gh[0] == "u4pru"
        # equator/prime meridian -> s000...
        gh = geohash_encode(np.array([0.0]), np.array([0.0]), precision=3)
        assert gh[0] == "s00"

    def test_edge_clipping(self):
        gh = geohash_encode(
            np.array([90.0, -90.0]), np.array([180.0, -180.0]), precision=2
        )
        assert gh[0] == "zz" and gh[1] == "00"

    def test_grid_counts_match_numpy(self, ray_session):
        got = geohash_grid(_geo_ds(), precision=2, size=8)
        ids, lat, lon = _pts()
        gh = geohash_encode(lat, lon, 2)
        u, cnt = np.unique(gh, return_counts=True)
        order = np.lexsort((u, -cnt))[:8]
        assert got["geohash"].to_pylist() == u[order].tolist()
        assert got["doc_count"].to_pylist() == cnt[order].tolist()

    def test_validation(self, ray_session):
        with pytest.raises(ValueError):
            geohash_grid(_geo_ds(), precision=0)


class TestBoundsCentroidRings:
    def test_bounds_matches_numpy(self, ray_session):
        from neural_search_ray.stages.geo import geo_bounds

        got = geo_bounds(_geo_ds())
        _, lat, lon = _pts()
        assert got["top"] == lat.max() and got["bottom"] == lat.min()
        assert got["left"] == lon.min() and got["right"] == lon.max()

    def test_centroid_matches_numpy(self, ray_session):
        from neural_search_ray.stages.geo import geo_centroid

        got = geo_centroid(_geo_ds())
        _, lat, lon = _pts()
        assert got["count"] == lat.size
        np.testing.assert_allclose(got["lat"], lat.mean(), rtol=1e-12)
        np.testing.assert_allclose(got["lon"], lon.mean(), rtol=1e-12)

    def test_rings_match_numpy(self, ray_session):
        from neural_search_ray.stages.geo import geo_distance_ranges

        edges = [3000.0, 7000.0, 12000.0]
        t = geo_distance_ranges(
            _geo_ds(), lat=12.3456, lon=56.789, edges_km=edges
        )
        _, lat, lon = _pts()
        d = haversine_km(lat, lon, 12.3456, 56.789)
        want = np.bincount(
            np.searchsorted(np.asarray(edges), d, side="right"), minlength=4
        )
        assert t["doc_count"].to_pylist() == want.tolist()
        assert t["ring"].to_pylist() == [0, 1, 2, 3]
        assert sum(t["doc_count"].to_pylist()) == lat.size
        assert t["from_km"].to_pylist()[:2] == [0.0, 3000.0]
        assert np.isinf(t["to_km"].to_pylist()[-1])

    def test_rings_validation(self, ray_session):
        from neural_search_ray.stages.geo import geo_distance_ranges

        for bad in ([], [5.0, 5.0], [-1.0, 4.0]):
            with pytest.raises(ValueError):
                geo_distance_ranges(
                    _geo_ds(), lat=0.0, lon=0.0, edges_km=bad
                )


class TestGeotile:
    def test_known_tiles(self):
        from neural_search_ray.stages.geo import geotile_encode

        lat = np.array([0.01, 85.3, -85.3, 51.5])
        lon = np.array([0.01, -180.0, 179.99, -0.13])
        x, y = geotile_encode(lat, lon, 1)
        # east/west split at lon 0, north/south at lat 0 (z=1)
        assert x.tolist() == [1, 0, 1, 0]
        assert y.tolist() == [0, 0, 1, 0]
        # clamp keeps extreme latitudes inside [0, 2^z)
        assert ((y >= 0) & (y <= 1)).all()

    def test_grid_counts_match_numpy(self, ray_session):
        from collections import Counter

        from neural_search_ray.stages.geo import geotile_encode, geotile_grid

        _, lat, lon = _pts()
        x, y = geotile_encode(lat, lon, 3)
        cnt = Counter(f"3/{a}/{b}" for a, b in zip(x.tolist(), y.tolist()))
        want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:10]
        t = geotile_grid(_geo_ds(), zoom=3, size=10)
        got = list(zip(t["tile"].to_pylist(), t["doc_count"].to_pylist()))
        assert got == want

    def test_validation(self, ray_session):
        from neural_search_ray.stages.geo import geotile_grid

        with pytest.raises(ValueError):
            geotile_grid(_geo_ds(), zoom=40)


class TestGeoLine:
    """stages/geo.py geo_line — per-user first-K track points by
    (ts, id); partial head + one groupby merge."""

    def _events(self, n=400, users=7, seed=3):
        rng = np.random.default_rng(seed)
        eid = np.arange(n, dtype=np.int64)
        user = rng.integers(0, users, n).astype(np.int64)
        # duplicate timestamps on purpose: the id tiebreak must decide
        ts = rng.integers(0, 50, n).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "ts": pa.array(ts).cast(pa.timestamp("us")),
                "user_id": pa.array(user),
            }
        )

    def test_matches_reference(self, ray_session):
        from neural_search_ray.stages.geo import add_geo_columns, geo_line

        t = self._events()
        ds = add_geo_columns(
            ray.data.from_arrow(t).repartition(8)
        )
        out = pa.Table.from_pylist(geo_line(ds, size=5).take_all())
        # reference: pandas sort + head per user
        import pandas as pd

        df = t.to_pandas()
        df["ts_us"] = df["ts"].astype("int64")
        df["lat"] = (df["event_id"] * 7919 % 18000) / 100.0 - 90.0
        df["lon"] = (df["event_id"] * 104729 % 36000) / 100.0 - 180.0
        want_rows = []
        for u, g in df.sort_values(["ts_us", "event_id"]).groupby("user_id"):
            for seq, (_, r) in enumerate(g.head(5).iterrows()):
                want_rows.append((u, seq, r["lat"], r["lon"], r["ts_us"]))
        got = sorted(
            zip(
                out["user_id"].to_pylist(),
                out["seq"].to_pylist(),
                out["lat"].to_pylist(),
                out["lon"].to_pylist(),
                out["ts_us"].to_pylist(),
            )
        )
        assert got == sorted(want_rows)

    def test_user_with_fewer_points(self, ray_session):
        from neural_search_ray.stages.geo import add_geo_columns, geo_line

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([10, 5, 1], pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array([0, 0, 1], pa.int64()),
            }
        )
        out = pa.Table.from_pylist(
            geo_line(add_geo_columns(ray.data.from_arrow(t)), size=5).take_all()
        )
        by_user = {}
        for u, s, e in zip(
            out["user_id"].to_pylist(), out["seq"].to_pylist(),
            out["ts_us"].to_pylist(),
        ):
            by_user.setdefault(u, []).append((s, e))
        assert by_user[0] == [(0, 5), (1, 10)]  # ts-ordered, seq dense
        assert by_user[1] == [(0, 1)]
