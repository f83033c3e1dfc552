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
