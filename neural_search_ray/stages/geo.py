"""Geo queries and aggregations (OpenSearch geo_point surface).

Reference restatement: OpenSearch serves ``geo_bounding_box`` /
``geo_distance`` queries, geo-distance sorting, and the
``geohash_grid`` bucket aggregation over ``geo_point`` fields (Lucene
LatLonPoint + BKD tree). The neural-search reference inherits these
from core and composes them with its processors unchanged.

Ray-native restatement: a geo point is two float64 columns (lat, lon).
The bounding-box query is a pure-comparison batch filter (the BKD
range-scan analogue); geo-distance sort is a per-batch haversine +
per-batch top-k prune then one bounded sort; geohash_grid is a
per-batch cell encode + partial counts, one (cell)-groupby exchange of
partials — the standard partial/combine agg shape.

The test tables carry no geo columns, so ``add_geo_columns`` derives
deterministic coordinates from the integer id — pure int64 arithmetic
(id*7919 % 18000, id*104729 % 36000 mapped to [-90,90) / [-180,180)),
identical in numpy and SQL, documented here as the fixture contract.

Geohash encode is pure IEEE arithmetic (add, div, mul, floor, bit
interleave) — NO trig — so the SQL oracle reproduces cells exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
EARTH_RADIUS_KM = 6371.0


def add_geo_columns(
    ds: "ray.data.Dataset", id_col: str = "event_id"
) -> "ray.data.Dataset":
    """Attach deterministic synthetic (lat, lon) derived from the id —
    the geo fixture (no geo columns in the test tables)."""

    def attach(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = (ids * 7919 % 18000).astype(np.float64) / 100.0 - 90.0
        lon = (ids * 104729 % 36000).astype(np.float64) / 100.0 - 180.0
        return batch.append_column("lat", pa.array(lat)).append_column(
            "lon", pa.array(lon)
        )

    return ds.map_batches(attach, batch_format="pyarrow")


def geo_bounding_box(
    ds: "ray.data.Dataset",
    *,
    top: float,
    left: float,
    bottom: float,
    right: float,
) -> "ray.data.Dataset":
    """geo_bounding_box query: rows with bottom <= lat <= top and
    left <= lon <= right (non-dateline-crossing box) — one vectorized
    comparison per batch, the LatLonPoint box-scan analogue."""
    if top < bottom:
        raise ValueError("top must be >= bottom")
    if right < left:
        raise ValueError("right must be >= left (dateline crossing "
                         "unsupported; split the box)")

    def flt(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        m = (lat >= bottom) & (lat <= top) & (lon >= left) & (lon <= right)
        return batch.filter(pa.array(m))

    return ds.map_batches(flt, batch_format="pyarrow")


def haversine_km(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Great-circle distance (haversine form, the OpenSearch ``arc``
    distance_type), float64. Operation order fixed and mirrored by the
    SQL oracle; libm sin/cos may differ by ulps across engines, so
    consumers round to 6 decimals before comparing."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(lat2 - lat1)
    dl = np.radians(lon2 - lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(
        dl / 2.0
    ) ** 2
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def geo_distance_topk(
    ds: "ray.data.Dataset",
    *,
    lat: float,
    lon: float,
    k: int,
    id_col: str = "event_id",
) -> pa.Table:
    """Geo-distance sort (_geo_distance sort / geo_distance query as a
    k-NN): the k nearest rows to (lat, lon) by haversine, ties broken
    by id. Per-batch distance + per-batch top-k prune (argpartition),
    then one k×blocks-bounded driver merge — never a global sort."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def prune(batch: pa.Table) -> pa.Table:
        d = haversine_km(
            batch["lat"].to_numpy(zero_copy_only=False),
            batch["lon"].to_numpy(zero_copy_only=False),
            lat,
            lon,
        )
        batch = batch.append_column("distance_km", pa.array(d))
        if len(batch) > k:
            # tie-aware prune: duplicate coordinates give bit-equal
            # distances, so the keep set must honor the id tiebreak
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            batch = batch.take(pa.array(np.lexsort((ids, d))[:k]))
        return batch

    cand = ds.map_batches(prune, batch_format="pyarrow").take_all()
    ids = np.asarray([r[id_col] for r in cand], dtype=np.int64)
    d = np.asarray([r["distance_km"] for r in cand], dtype=np.float64)
    order = np.lexsort((ids, d))[:k]
    cols = {c: [cand[i][c] for i in order] for c in cand[0]} if cand else {}
    return pa.table(cols) if cand else pa.table({})


def geohash_encode(
    lat: np.ndarray, lon: np.ndarray, precision: int
) -> np.ndarray:
    """Vectorized geohash (base32, lon-first bit interleave). Pure
    IEEE float ops + int64 bit shifts — bit-identical to the SQL
    oracle's floor/interleave replay."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lonb = np.floor((lon + 180.0) / 360.0 * (1 << nlon)).astype(np.int64)
    latb = np.floor((lat + 90.0) / 180.0 * (1 << nlat)).astype(np.int64)
    lonb = np.minimum(lonb, (1 << nlon) - 1)  # lon == 180 edge
    latb = np.minimum(latb, (1 << nlat) - 1)
    cell = np.zeros(lon.shape, dtype=np.int64)
    for i in range(nlon):
        cell |= ((lonb >> (nlon - 1 - i)) & 1) << (nbits - 1 - 2 * i)
    for i in range(nlat):
        cell |= ((latb >> (nlat - 1 - i)) & 1) << (nbits - 2 - 2 * i)
    chars = np.array(list(GEOHASH32))
    out = np.empty(lon.shape, dtype=f"U{precision}")
    out[:] = ""
    acc = None
    for i in range(precision):
        c = chars[(cell >> (5 * (precision - 1 - i))) & 31]
        acc = c if acc is None else np.char.add(acc, c)
    return acc


def geohash_grid(
    ds: "ray.data.Dataset", *, precision: int, size: int = 10
) -> pa.Table:
    """geohash_grid bucket aggregation: doc counts per geohash cell,
    top ``size`` by (count desc, geohash asc). Per-batch encode +
    per-cell partial counts (one row per distinct cell per batch),
    one groupby(cell) exchange of the partials."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")

    def partial(batch: pa.Table) -> pa.Table:
        gh = geohash_encode(
            batch["lat"].to_numpy(zero_copy_only=False),
            batch["lon"].to_numpy(zero_copy_only=False),
            precision,
        )
        u, cnt = np.unique(gh, return_counts=True)
        return pa.table(
            {
                "geohash": pa.array(u.tolist(), pa.string()),
                "_cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "geohash": group["geohash"].slice(0, 1),
                "doc_count": pa.array(
                    [int(np.sum(group["_cnt"].to_numpy()))], pa.int64()
                ),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("geohash")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )  # one row per occupied cell — bounded by 32^precision
    gh = np.asarray([r["geohash"] for r in cells])
    n = np.asarray([r["doc_count"] for r in cells], dtype=np.int64)
    order = np.lexsort((gh, -n))[:size]
    return pa.table(
        {
            "geohash": pa.array(gh[order].tolist(), pa.string()),
            "doc_count": pa.array(n[order]),
        }
    )


def geo_bounds(ds: "ray.data.Dataset") -> dict:
    """geo_bounds aggregation (OpenSearch GeoBoundsAggregator): the
    smallest bounding box containing every point — top/bottom = max/min
    lat, left/right = min/max lon (non-wrapping form). Per-batch min/max
    partials (one 4-value row per batch), bounded driver combine —
    extrema are exact float comparisons, no rounding contract needed."""

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "top": pa.array([float(lat.max())]),
                "bottom": pa.array([float(lat.min())]),
                "left": pa.array([float(lon.min())]),
                "right": pa.array([float(lon.max())]),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if not rows:
        return {"top": None, "bottom": None, "left": None, "right": None}
    return {
        "top": max(r["top"] for r in rows),
        "bottom": min(r["bottom"] for r in rows),
        "left": min(r["left"] for r in rows),
        "right": max(r["right"] for r in rows),
    }


def geo_centroid(ds: "ray.data.Dataset") -> dict:
    """geo_centroid aggregation (OpenSearch GeoCentroidAggregator):
    arithmetic mean of lat and lon over all points. Per-batch
    (Σlat, Σlon, n) partials — the associative shard merge — one
    bounded driver combine, one division each at the end. Cross-block
    float-sum order differs from SQL's sequential SUM; consumers round
    to 6 decimals (the established float-sum contract)."""

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "slat": pa.array([float(lat.sum())]),
                "slon": pa.array([float(lon.sum())]),
                "n": pa.array([len(batch)], pa.int64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return {"lat": None, "lon": None, "count": 0}
    return {
        "lat": sum(r["slat"] for r in rows) / n,
        "lon": sum(r["slon"] for r in rows) / n,
        "count": int(n),
    }


def geo_distance_ranges(
    ds: "ray.data.Dataset",
    *,
    lat: float,
    lon: float,
    edges_km: list[float],
) -> pa.Table:
    """geo_distance range aggregation (OpenSearch GeoDistanceAggregator):
    doc counts per half-open distance ring [from, to) around an origin,
    with the first ring [0, edges[0]) and the last [edges[-1], ∞).
    Per-batch haversine (the SAME pinned op order as geo_distance_topk,
    so bucket assignment is bit-consistent with the SQL oracle's replay)
    + np.searchsorted bin counts — one (len(edges)+1)-vector partial per
    batch, bounded driver combine. Returns (ring, from_km, to_km,
    doc_count), zero-count rings included (the reference keeps empty
    range buckets)."""
    edges = np.asarray(sorted(edges_km), dtype=np.float64)
    if edges.size == 0 or (np.diff(edges) <= 0).any() or edges[0] <= 0:
        raise ValueError("edges_km must be strictly increasing and > 0")
    nb = edges.size + 1

    def partial(batch: pa.Table) -> pa.Table:
        d = haversine_km(
            batch["lat"].to_numpy(zero_copy_only=False),
            batch["lon"].to_numpy(zero_copy_only=False),
            lat,
            lon,
        )
        ring = np.searchsorted(edges, d, side="right")
        cnt = np.bincount(ring, minlength=nb).astype(np.int64)
        return pa.table(
            {
                "ring": pa.array(np.arange(nb, dtype=np.int64)),
                "_cnt": pa.array(cnt),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow").take_all()
    )  # nb rows per block — bounded
    total = np.zeros(nb, dtype=np.int64)
    for r in rows:
        total[r["ring"]] += r["_cnt"]
    lo = np.concatenate([[0.0], edges])
    hi = np.concatenate([edges, [np.inf]])
    return pa.table(
        {
            "ring": pa.array(np.arange(nb, dtype=np.int64)),
            "from_km": pa.array(lo),
            "to_km": pa.array(hi),
            "doc_count": pa.array(total),
        }
    )


def geotile_encode(
    lat: np.ndarray, lon: np.ndarray, zoom: int
) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator tile (x, y) at ``zoom`` (the OpenSearch
    geotile_grid key "z/x/y"). Standard slippy-map math:
    x = ⌊(lon+180)/360·2^z⌋, y = ⌊(1 − ln(tan φ + sec φ)/π)/2·2^z⌋
    with lat clamped to the Mercator bound ±85.0511°. Operation order
    fixed and mirrored by the SQL oracle (same libm-ulp caveat as
    haversine — cell edges are irrational, fixture points are on a
    0.01° grid, so a flip would need an exact edge landing)."""
    n = np.int64(1) << zoom
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    latc = np.clip(lat, -85.0511, 85.0511)
    latr = np.radians(latc)
    y = np.floor(
        (1.0 - np.log(np.tan(latr) + 1.0 / np.cos(latr)) / np.pi)
        / 2.0
        * n
    ).astype(np.int64)
    return np.clip(x, 0, n - 1), np.clip(y, 0, n - 1)


def geotile_grid(
    ds: "ray.data.Dataset", *, zoom: int, size: int = 10
) -> pa.Table:
    """geotile_grid bucket aggregation: doc counts per Web-Mercator
    tile key "z/x/y", top ``size`` by (count desc, key asc) — same
    partial/combine shape as geohash_grid."""
    if not 0 <= zoom <= 29:
        raise ValueError("zoom must be in [0, 29]")

    def partial(batch: pa.Table) -> pa.Table:
        x, y = geotile_encode(
            batch["lat"].to_numpy(zero_copy_only=False),
            batch["lon"].to_numpy(zero_copy_only=False),
            zoom,
        )
        cell = x << 32 | y
        u, cnt = np.unique(cell, return_counts=True)
        keys = [f"{zoom}/{c >> 32}/{c & 0xFFFFFFFF}" for c in u.tolist()]
        return pa.table(
            {
                "tile": pa.array(keys, pa.string()),
                "_cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tile": group["tile"].slice(0, 1),
                "doc_count": pa.array(
                    [int(np.sum(group["_cnt"].to_numpy()))], pa.int64()
                ),
            }
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tile")
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )  # one row per occupied tile — bounded by 4^zoom
    t = np.asarray([r["tile"] for r in cells])
    n = np.asarray([r["doc_count"] for r in cells], dtype=np.int64)
    order = np.lexsort((t, -n))[:size]
    return pa.table(
        {
            "tile": pa.array(t[order].tolist(), pa.string()),
            "doc_count": pa.array(n[order]),
        }
    )


def geo_line(
    ds: "ray.data.Dataset",
    size: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> "ray.data.Dataset":
    """geo_line aggregation (OpenSearch GeoLineAggregator with
    sort=timestamp, ascending, size-capped): per bucket (user), the
    FIRST ``size`` track points ordered by (ts, id tiebreak), emitted
    as (user, seq, lat, lon, ts_us) rows — the LineString vertex list.

    Scale shape: per-batch vectorized head-``size`` per user (the top-K
    monoid — a batch can only shrink), then ONE groupby(user) merge
    that re-sorts the <= size·n_batches surviving rows per user. The
    event stream is never globally sorted."""

    def partial(batch: pa.Table) -> pa.Table:
        user = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u_s = user[order]
        uniq, starts = np.unique(u_s, return_index=True)
        within = np.arange(u_s.size) - np.repeat(
            starts, np.diff(np.append(starts, u_s.size))
        )
        keep = order[within < size]
        return pa.table(
            {
                user_col: pa.array(user[keep], pa.int64()),
                "ts_us": pa.array(ts[keep], pa.int64()),
                id_col: pa.array(eid[keep], pa.int64()),
                "lat": pa.array(lat[keep], pa.float64()),
                "lon": pa.array(lon[keep], pa.float64()),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        eid = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))[:size]
        n = order.size
        return pa.table(
            {
                user_col: group[user_col].take(pa.array(order)),
                "seq": pa.array(np.arange(n, dtype=np.int64)),
                "lat": group["lat"].take(pa.array(order)),
                "lon": group["lon"].take(pa.array(order)),
                "ts_us": pa.array(ts[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(merge, batch_format="pyarrow")
    )
