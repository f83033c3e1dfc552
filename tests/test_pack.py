"""Sequence packing (stages/pack.py): span invariants + oracle identity."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from neural_search_ray.stages.pack import count_tokens, pack_sequences


def _docs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


def _spans(ds):
    t = pa.Table.from_pylist(ds.take_all())
    idx = np.lexsort((t["seq_id"].to_numpy(), t["doc_id"].to_numpy()))
    return {c: t[c].to_numpy()[idx] for c in t.column_names}


def test_count_tokens():
    arr = pa.array(["a b c", "", "  x ", None, "one"])
    np.testing.assert_array_equal(count_tokens(arr), [3, 0, 1, 0, 1])


def test_pack_basic_invariants():
    rng = np.random.default_rng(7)
    texts = [" ".join(["w"] * int(n)) for n in rng.integers(0, 40, size=200)]
    L = 16
    s = _spans(pack_sequences(_docs(texts), seq_len=L, bucket_span=32))
    n_per_doc = np.array([len(t.split()) for t in texts])
    # spans partition each non-empty doc's tokens in order
    for d in range(200):
        m = s["doc_id"] == d
        assert s["n_tokens"][m].sum() == n_per_doc[d]
        if m.any():
            starts = s["doc_start"][m]
            assert starts[0] == 0
            np.testing.assert_array_equal(
                starts[1:], np.cumsum(s["n_tokens"][m])[:-1]
            )
    # every sequence except the last is exactly L tokens, no overlap
    total = n_per_doc.sum()
    fill = np.zeros(int(-(-total // L)), dtype=np.int64)
    np.add.at(fill, s["seq_id"], s["n_tokens"])
    assert (fill[:-1] == L).all()
    assert fill[-1] == total - L * (fill.size - 1)
    # within a sequence, (seq_start, n_tokens) tile [0, L) without gaps
    order = np.lexsort((s["seq_start"], s["seq_id"]))
    sid, st, nt = s["seq_id"][order], s["seq_start"][order], s["n_tokens"][order]
    new = np.concatenate(([True], sid[1:] != sid[:-1]))
    assert (st[new] == 0).all()
    assert (st[~new] == (st + nt)[:-1][~new[1:]]).all()


def test_pack_global_order_is_doc_id():
    # doc order = doc_id order regardless of input block order
    texts = ["a b c d e", "f g", "h i j"]
    ds = _docs(texts, ids=[5, 1, 9])  # shuffled ids
    s = _spans(pack_sequences(ds, seq_len=4, bucket_span=2))
    # doc 1 (2 toks) first, doc 5 (5 toks), doc 9 (3 toks); L=4
    # seq0: doc1[0:2], doc5[0:2]; seq1: doc5[2:5], doc9[0:1]; seq2: doc9[1:3]
    rows = list(zip(s["doc_id"], s["seq_id"], s["doc_start"], s["seq_start"], s["n_tokens"]))
    assert rows == [
        (1, 0, 0, 0, 2),
        (5, 0, 0, 2, 2),
        (5, 1, 2, 0, 3),
        (9, 1, 0, 3, 1),
        (9, 2, 1, 0, 2),
    ]


def test_pack_empty_docs_and_long_doc():
    texts = ["", " ".join(["t"] * 100), ""]
    s = _spans(pack_sequences(_docs(texts), seq_len=8, bucket_span=1))
    assert set(s["doc_id"]) == {1}
    assert s["n_tokens"].sum() == 100
    assert len(s["doc_id"]) == 13  # ceil(100/8)


def test_pack_matches_duckdb_oracle(tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from neural_search_ray.pipelines.suite import build_oracle_sql

    sf = "/root/testdata/sf0.001"
    from neural_search_ray.pipelines.suite import q_sequence_pack

    got = pa.Table.from_pylist(q_sequence_pack(sf).take_all())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = con.execute(build_oracle_sql()["sequence_pack"]).arrow()
    assert got.num_rows == want.num_rows
    key = lambda t: sorted(
        zip(*[t[c].to_pylist() for c in sorted(t.column_names)])
    )
    assert key(got) == key(want)


class TestPackProperties:
    """Pure-kernel property tests (no Ray) against a per-token reference."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(st.integers(1, 50), min_size=1, max_size=30),
        st.integers(1, 17),
        st.integers(0, 100),
    )
    def test_expand_spans_matches_reference(self, counts, L, base):
        from neural_search_ray.stages.pack import expand_spans

        n = np.asarray(counts, dtype=np.int64)
        ids = np.arange(n.size, dtype=np.int64) * 3 + 1
        before = base + np.cumsum(n) - n
        out = expand_spans(ids, n, before, L)
        # reference: walk every token, note (doc, seq, pos-in-doc, pos-in-seq)
        ref = []
        cur = None
        for d in range(n.size):
            for t in range(n[d]):
                g = before[d] + t
                key = (ids[d], g // L)
                if cur is None or cur[:2] != key:
                    if cur is not None:
                        ref.append(cur)
                    cur = (key[0], key[1], t, g % L, 0)
                cur = cur[:4] + (cur[4] + 1,)
        if cur is not None:
            ref.append(cur)
        got = list(
            zip(
                out["doc_id"],
                out["seq_id"],
                out["doc_start"],
                out["seq_start"],
                out["n_tokens"],
            )
        )
        assert [tuple(int(x) for x in r) for r in got] == [
            tuple(int(x) for x in r) for r in ref
        ]
