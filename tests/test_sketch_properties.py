"""Property-based invariants for the mergeable sketches (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_ray.agg.sketches import HyperLogLog, MisraGries, TDigest


@settings(max_examples=30, deadline=None)
@given(
    a=st.lists(st.integers(0, 10**12), max_size=300),
    b=st.lists(st.integers(0, 10**12), max_size=300),
    p=st.integers(6, 12),
)
def test_hll_merge_is_union(a, b, p):
    ha = HyperLogLog(p).add(np.asarray(a, dtype=np.int64))
    hb = HyperLogLog(p).add(np.asarray(b, dtype=np.int64))
    hu = HyperLogLog(p).add(np.asarray(a + b, dtype=np.int64))
    np.testing.assert_array_equal(
        ha.merge(hb).registers, hu.registers
    )


@settings(max_examples=30, deadline=None)
@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=500),
    k=st.integers(2, 20),
    cut=st.integers(1, 499),
)
def test_misra_gries_guarantee(vals, k, cut):
    arr = np.asarray(vals, dtype=np.int64)
    mg = MisraGries(k)
    mg.add(arr[:cut])
    mg.add(arr[cut:])
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    bound = len(vals) / (k + 1)
    assert mg.offset_total <= bound
    for v, c in true.items():
        if c > bound:
            assert v in mg.counts, (v, c, bound)
    for v, c in mg.counts.items():
        assert 0 < c <= true[v]
        assert true[v] - c <= mg.offset_total


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=400
    ),
    q=st.floats(0.0, 1.0),
)
def test_tdigest_quantile_within_range(vals, q):
    t = TDigest(100).add(np.asarray(vals, dtype=np.float64))
    est = t.quantile(q)
    assert min(vals) <= est <= max(vals)
    assert t.quantile(0.0) == min(vals)
    assert t.quantile(1.0) == max(vals)


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.floats(0, 1e6, allow_nan=False), min_size=4, max_size=400
    ),
    nchunks=st.integers(2, 4),
)
def test_tdigest_merge_count_and_bounds(vals, nchunks):
    arr = np.asarray(vals, dtype=np.float64)
    chunks = np.array_split(arr, nchunks)
    t = TDigest(100)
    for c in chunks:
        if c.size:
            t.merge(TDigest(100).add(c))
    assert t.count == arr.size
    assert t.quantile(0.0) == arr.min()
    assert t.quantile(1.0) == arr.max()
    # serde survives merge chains
    rt = TDigest.from_bytes(t.to_bytes())
    assert rt.quantile(0.5) == t.quantile(0.5)
