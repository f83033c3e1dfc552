import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_ray.index.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_simple():
    vals = np.array([0, 1, 127, 128, 300, 2**31, 2**40], dtype=np.int64)
    assert (varint_decode(varint_encode(vals)) == vals).all()


def test_varint_empty():
    assert varint_encode(np.empty(0, np.int64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**50), max_size=200))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.int64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


def test_postings_roundtrip():
    docs = np.array([3, 7, 8, 100, 5000], dtype=np.int64)
    tfs = np.array([1, 2, 1, 9, 3], dtype=np.int64)
    db, tb, bm = encode_postings(docs, tfs, block_size=2)
    d2, t2 = decode_postings(db, tb, df=5)
    assert (d2 == docs).all()
    assert (t2 == tfs).all()
    assert bm.tolist() == [2, 9, 3]  # max per block of 2


def test_postings_requires_sorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([5, 3]), np.array([1, 1]))


def test_postings_empty():
    db, tb, bm = encode_postings(np.empty(0, np.int64), np.empty(0, np.int64))
    assert db == b"" and tb == b"" and bm.size == 0


# ---- bit-packed FOR codec (PForDelta family) -------------------------------

def test_for_roundtrip_simple():
    from neural_search_ray.index.codec import for_decode, for_encode

    vals = np.array([0, 1, 127, 128, 300, 2**31, 2**40, 2**60], dtype=np.uint64)
    assert (for_decode(for_encode(vals)).astype(np.uint64) == vals).all()


def test_for_empty_and_count_check():
    from neural_search_ray.index.codec import for_decode, for_encode

    assert for_decode(for_encode(np.empty(0, np.uint64))).size == 0
    buf = for_encode(np.array([5, 6], dtype=np.uint64))
    with pytest.raises(ValueError):
        for_decode(buf, count=3)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**62), max_size=400),
)
def test_for_roundtrip_property(vals):
    from neural_search_ray.index.codec import for_decode, for_encode

    arr = np.array(vals, dtype=np.uint64)
    assert (for_decode(for_encode(arr), arr.size).astype(np.uint64) == arr).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=600),
    st.lists(st.integers(min_value=1, max_value=599), max_size=6),
)
def test_grouped_for_matches_single(vals, cutpoints):
    from neural_search_ray.index.codec import for_encode, grouped_for_encode

    flat = np.array(vals, dtype=np.uint64)
    cuts = np.unique([c for c in cutpoints if c < flat.size])
    starts = np.concatenate(([0], cuts)).astype(np.int64)
    ends = np.concatenate((cuts, [flat.size])).astype(np.int64)
    grouped = grouped_for_encode(flat, starts, ends)
    for s, e, buf in zip(starts, ends, grouped):
        assert buf == for_encode(flat[s:e])


def test_for_smaller_than_varint_on_small_deltas():
    from neural_search_ray.index.codec import for_encode, varint_encode

    rng = np.random.RandomState(3)
    deltas = rng.randint(1, 16, size=10_000).astype(np.uint64)
    assert len(for_encode(deltas)) < 0.6 * len(varint_encode(deltas))
