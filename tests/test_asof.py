"""As-of join (stages/asof.py): inclusive match, LEFT nulls, bucketing."""

import numpy as np
import pyarrow as pa
import ray

from neural_search_ray.stages.asof import asof_join


def _ds(rows, schema=None):
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()), ("ts", pa.int64()), ("value", pa.float64())]
)


def _run(left_rows, right_rows, **kw):
    out = asof_join(
        _ds(left_rows, SCHEMA),
        _ds(right_rows, SCHEMA),
        key_col="user_id",
        ts_col="ts",
        right_cols=["event_id", "ts", "value"],
        **kw,
    )
    rows = sorted(out.take_all(), key=lambda r: r["event_id"])
    return rows


def test_basic_latest_at_or_before():
    left = [
        {"event_id": 1, "user_id": 7, "ts": 100, "value": 1.0},
        {"event_id": 2, "user_id": 7, "ts": 250, "value": 2.0},
    ]
    right = [
        {"event_id": 10, "user_id": 7, "ts": 50, "value": 0.5},
        {"event_id": 11, "user_id": 7, "ts": 200, "value": 0.7},
        {"event_id": 12, "user_id": 7, "ts": 300, "value": 0.9},
    ]
    rows = _run(left, right)
    assert rows[0]["event_id_r"] == 10 and rows[0]["ts_r"] == 50
    assert rows[1]["event_id_r"] == 11 and rows[1]["value_r"] == 0.7


def test_equal_ts_is_inclusive_and_no_match_is_null():
    left = [
        {"event_id": 1, "user_id": 3, "ts": 100, "value": 1.0},
        {"event_id": 2, "user_id": 4, "ts": 100, "value": 2.0},
        {"event_id": 3, "user_id": 3, "ts": 10, "value": 3.0},
    ]
    right = [{"event_id": 20, "user_id": 3, "ts": 100, "value": 0.1}]
    rows = _run(left, right)
    assert rows[0]["event_id_r"] == 20  # ts == ts matches (>=)
    assert rows[1]["event_id_r"] is None  # user 4: no right rows
    assert rows[1]["value_r"] is None
    assert rows[2]["event_id_r"] is None  # earlier than every right row


def test_keys_never_cross_and_buckets_collide():
    # users 5 and 5+64 share bucket 5 at num_buckets=64 — must not mix
    left = [
        {"event_id": 1, "user_id": 5, "ts": 100, "value": 1.0},
        {"event_id": 2, "user_id": 69, "ts": 100, "value": 2.0},
    ]
    right = [
        {"event_id": 30, "user_id": 5, "ts": 90, "value": 0.5},
        {"event_id": 31, "user_id": 69, "ts": 95, "value": 0.6},
    ]
    rows = _run(left, right, num_buckets=64)
    assert rows[0]["event_id_r"] == 30
    assert rows[1]["event_id_r"] == 31


def test_matches_duckdb_asof_random():
    import duckdb

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 400
    mk = lambda n, base: [
        {
            "event_id": base + i,
            "user_id": int(rng.integers(0, 20)),
            "ts": int(rng.integers(0, 10_000)),
            "value": float(np.round(rng.random(), 6)),
        }
        for i in range(n)
    ]
    # dedupe (user, ts) collisions: DuckDB ASOF picks an arbitrary row
    # among equal right ts — keep the comparison well-defined
    left, right = mk(n_l, 0), []
    seen = set()
    for r in mk(n_r, 10_000):
        if (r["user_id"], r["ts"]) not in seen:
            seen.add((r["user_id"], r["ts"]))
            right.append(r)
    got = _run(left, right)
    con = duckdb.connect()
    con.register("l", pa.Table.from_pylist(left, SCHEMA))
    con.register("r", pa.Table.from_pylist(right, SCHEMA))
    want = con.execute(
        """SELECT l.event_id, l.user_id, l.ts, l.value,
                  r.event_id AS event_id_r, r.ts AS ts_r, r.value AS value_r
           FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
           ORDER BY l.event_id"""
    ).arrow()
    assert len(got) == want.num_rows
    for col in want.column_names:
        assert [r[col] for r in got] == want[col].to_pylist(), col


def test_tiebreak_col_deterministic_among_equal_ts():
    left = [{"event_id": 1, "user_id": 7, "ts": 100, "value": 1.0}]
    # three right rows at the SAME (key, ts): largest tiebreak must win,
    # independent of shuffle arrival order
    right = [
        {"event_id": 40, "user_id": 7, "ts": 100, "value": 0.4},
        {"event_id": 42, "user_id": 7, "ts": 100, "value": 0.2},
        {"event_id": 41, "user_id": 7, "ts": 100, "value": 0.1},
    ]
    for perm in ([0, 1, 2], [2, 1, 0], [1, 2, 0]):
        rows = _run(left, [right[i] for i in perm], tiebreak_col="event_id")
        assert rows[0]["event_id_r"] == 42
        assert rows[0]["value_r"] == 0.2


def test_key_must_be_integer():
    import pytest

    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.float64()),
         ("ts", pa.int64()), ("value", pa.float64())]
    )
    rows = [{"event_id": 1, "user_id": 1.5, "ts": 10, "value": 0.0}]
    with pytest.raises(TypeError, match="integer Arrow type"):
        asof_join(
            _ds(rows, schema), _ds(rows, schema),
            key_col="user_id", ts_col="ts", right_cols=["value"],
        )


def test_tiebreak_must_be_integer():
    import pytest

    rows = [{"event_id": 1, "user_id": 1, "ts": 10, "value": 0.0}]
    with pytest.raises(TypeError, match="tiebreak"):
        asof_join(
            _ds(rows, SCHEMA), _ds(rows, SCHEMA),
            key_col="user_id", ts_col="ts", right_cols=["value"],
            tiebreak_col="value",
        )


def test_nan_ts_right_dropped_left_unmatched():
    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.float64()), ("value", pa.float64())]
    )
    left = [
        {"event_id": 1, "user_id": 7, "ts": 100.0, "value": 1.0},
        {"event_id": 2, "user_id": 7, "ts": float("nan"), "value": 2.0},
    ]
    right = [
        {"event_id": 50, "user_id": 7, "ts": 90.0, "value": 0.5},
        # NaN ts sorts last in a plain lexsort — without the guard this
        # row would be treated as the "latest" right row
        {"event_id": 51, "user_id": 7, "ts": float("nan"), "value": 0.9},
    ]
    out = asof_join(
        _ds(left, schema), _ds(right, schema),
        key_col="user_id", ts_col="ts", right_cols=["event_id", "value"],
    )
    rows = sorted(out.take_all(), key=lambda r: r["event_id"])
    assert rows[0]["event_id_r"] == 50  # NaN right row never matches
    assert rows[1]["event_id_r"] is None  # NaN left ts matches nothing


def test_broadcast_matches_shuffle_random():
    """asof_join_broadcast (shuffle-free small-right path) must agree with
    the shuffle form AND DuckDB on random data."""
    import duckdb

    from neural_search_ray.stages.asof import asof_join_broadcast

    rng = np.random.default_rng(5)
    mk = lambda n, base: [
        {
            "event_id": base + i,
            "user_id": int(rng.integers(0, 15)),
            "ts": int(rng.integers(0, 5_000)),
            "value": float(np.round(rng.random(), 6)),
        }
        for i in range(n)
    ]
    left = mk(300, 0)
    right, seen = [], set()
    for r in mk(400, 10_000):  # dedupe (user, ts): DuckDB picks arbitrarily
        if (r["user_id"], r["ts"]) not in seen:
            seen.add((r["user_id"], r["ts"]))
            right.append(r)

    shuffle_rows = _run(left, right)
    out = asof_join_broadcast(
        _ds(left, SCHEMA),
        pa.Table.from_pylist(right, SCHEMA),
        key_col="user_id",
        ts_col="ts",
        right_cols=["event_id", "ts", "value"],
    )
    bcast_rows = sorted(out.take_all(), key=lambda r: r["event_id"])
    assert bcast_rows == shuffle_rows

    con = duckdb.connect()
    con.register("l", pa.Table.from_pylist(left, SCHEMA))
    con.register("r", pa.Table.from_pylist(right, SCHEMA))
    want = con.execute(
        """SELECT l.event_id, l.user_id, l.ts, l.value,
                  r.event_id AS event_id_r, r.ts AS ts_r, r.value AS value_r
           FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
           ORDER BY l.event_id"""
    ).arrow()
    for col in want.column_names:
        assert [r[col] for r in bcast_rows] == want[col].to_pylist(), col


def test_broadcast_tiebreak_and_nan():
    from neural_search_ray.stages.asof import asof_join_broadcast

    schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("ts", pa.float64()), ("value", pa.float64())]
    )
    left = [
        {"event_id": 1, "user_id": 7, "ts": 100.0, "value": 1.0},
        {"event_id": 2, "user_id": 7, "ts": float("nan"), "value": 2.0},
        {"event_id": 3, "user_id": 9, "ts": 50.0, "value": 3.0},  # no right key
    ]
    right = [
        {"event_id": 40, "user_id": 7, "ts": 100.0, "value": 0.4},
        {"event_id": 42, "user_id": 7, "ts": 100.0, "value": 0.2},
        {"event_id": 41, "user_id": 7, "ts": float("nan"), "value": 0.9},
    ]
    out = asof_join_broadcast(
        _ds(left, schema),
        pa.Table.from_pylist(right, schema),
        key_col="user_id",
        ts_col="ts",
        right_cols=["event_id", "value"],
        tiebreak_col="event_id",
    )
    rows = sorted(out.take_all(), key=lambda r: r["event_id"])
    assert rows[0]["event_id_r"] == 42  # largest tiebreak among equal ts
    assert rows[1]["event_id_r"] is None  # NaN left ts
    assert rows[2]["event_id_r"] is None  # key absent on right


def test_broadcast_empty_right_all_null():
    from neural_search_ray.stages.asof import asof_join_broadcast

    left = [{"event_id": 1, "user_id": 7, "ts": 100, "value": 1.0}]
    out = asof_join_broadcast(
        _ds(left, SCHEMA),
        SCHEMA.empty_table(),
        key_col="user_id",
        ts_col="ts",
        right_cols=["event_id", "value"],
    )
    rows = out.take_all()
    assert rows[0]["event_id_r"] is None and rows[0]["value_r"] is None


def test_nanosecond_precision_with_null_ts():
    """A null ts in a bucket must NOT coerce int64 ns epochs to float64
    (2^53 rounding would corrupt at-or-before comparisons)."""
    from neural_search_ray.stages.asof import asof_join, asof_join_broadcast

    base = 1_700_000_000_000_000_000  # ns epoch, needs 61 bits
    left = [
        {"event_id": 1, "user_id": 7, "ts": base + 100, "value": 1.0},
        {"event_id": 2, "user_id": 7, "ts": None, "value": 2.0},
    ]
    right = [
        # 100ns after left's ts — must NOT match; float64 would round
        # both to the same value and (right-before-left) WOULD match
        {"event_id": 50, "user_id": 7, "ts": base + 200, "value": 0.5},
        {"event_id": 51, "user_id": 7, "ts": base - 500, "value": 0.9},
    ]
    rows = _run(left, right)
    assert rows[0]["event_id_r"] == 51  # only the earlier row matches
    assert rows[1]["event_id_r"] is None  # null left ts

    out = asof_join_broadcast(
        _ds(left, SCHEMA), pa.Table.from_pylist(right, SCHEMA),
        key_col="user_id", ts_col="ts", right_cols=["event_id", "value"],
    )
    brows = sorted(out.take_all(), key=lambda r: r["event_id"])
    assert brows[0]["event_id_r"] == 51
    assert brows[1]["event_id_r"] is None


def test_trim_plan_matches_legacy_random(ray_session):
    """left_id_col trimmed-exchange plan: identical rows to the legacy
    single-exchange plan on random data with unmatched lefts and null
    ts on both sides."""
    rng = np.random.RandomState(11)
    n_l, n_r = 300, 400
    left = [
        {
            "event_id": int(i),
            "user_id": int(rng.randint(0, 20)),
            "ts": None if rng.rand() < 0.05 else int(rng.randint(0, 1000)),
            "value": float(rng.rand()),
        }
        for i in range(n_l)
    ]
    right = [
        {
            "event_id": int(1000 + i),
            "user_id": int(rng.randint(0, 25)),
            "ts": None if rng.rand() < 0.05 else int(rng.randint(0, 1000)),
            "value": float(rng.rand()),
        }
        for i in range(n_r)
    ]
    legacy = _run(left, right, tiebreak_col="event_id")
    trim = _run(left, right, tiebreak_col="event_id", left_id_col="event_id")
    assert trim == legacy


def test_trim_left_id_must_be_integer(ray_session):
    import pytest

    schema = pa.schema(
        [("eid", pa.string()), ("user_id", pa.int64()),
         ("ts", pa.int64()), ("value", pa.float64())]
    )
    left = _ds([{"eid": "a", "user_id": 1, "ts": 1, "value": 1.0}], schema)
    right = _ds([{"event_id": 1, "user_id": 1, "ts": 1, "value": 1.0}], SCHEMA)
    with pytest.raises(TypeError, match="left_id_col"):
        asof_join(
            left, right, key_col="user_id", ts_col="ts",
            right_cols=["event_id"], left_id_col="eid",
        )


def test_trim_requires_right_cols(ray_session):
    import pytest

    left = _ds([{"event_id": 1, "user_id": 1, "ts": 1, "value": 1.0}], SCHEMA)
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(
            left, left, key_col="user_id", ts_col="ts",
            right_cols=[], left_id_col="event_id",
        )
