"""Property tests (hypothesis) for the session-12 parsers and kernels:
ES|QL, classic query_string, CIDR arithmetic, ASCII folding."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from neural_search_ray.query.esql import EsqlError, parse_esql
from neural_search_ray.query.queryparser import (
    QueryStringError,
    parse_query,
)
from neural_search_ray.stages.ipfield import (
    cidr_filter_mask,
    format_ipv4,
    parse_cidr,
)


class TestEsqlParserProperties:
    @given(st.text(max_size=80))
    @settings(max_examples=200, deadline=None)
    def test_never_hangs_or_crashes_unexpectedly(self, text):
        """Arbitrary input either parses or raises EsqlError — nothing
        else escapes (no hangs, no index errors)."""
        try:
            parse_esql("FROM t | WHERE " + text)
        except EsqlError:
            pass

    @given(
        st.integers(min_value=-1000, max_value=1000),
        st.integers(min_value=-1000, max_value=1000),
        st.integers(min_value=-1000, max_value=1000),
    )
    @settings(max_examples=100, deadline=None)
    def test_arithmetic_precedence(self, a, b, c):
        """a + b * c parses mul-first regardless of literals."""
        st_ = parse_esql(f"FROM t | EVAL x = {a} + {b} * {c}")[1]
        (_name, expr), = st_.payload
        assert expr.op == "+"
        assert expr.right.op == "*"


class TestGrokProperties:
    @given(st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_grok_never_crashes_unexpectedly(self, text):
        """Arbitrary GROK pattern text either compiles or raises
        EsqlError (unknown library name, no captures, bad regex —
        nothing else escapes)."""
        from neural_search_ray.query.esql import _grok_regex

        try:
            _grok_regex(text)
        except EsqlError:
            pass

    @given(
        st.sampled_from(["WORD", "INT", "NUMBER", "IP", "NOTSPACE",
                         "LOGLEVEL", "GREEDYDATA"]),
        st.sampled_from(["a", "field_1", "Z9"]),
        st.sampled_from([None, "int", "float", "keyword"]),
    )
    @settings(max_examples=100, deadline=None)
    def test_grok_key_roundtrip(self, lib, name, typ):
        """Every library pattern with any capture name/type compiles to
        a valid RE2 regex whose named group list matches the keys."""
        import re as _re

        import pyarrow as pa

        from neural_search_ray.query.esql import _GROK_TYPES, _grok_regex

        key = f"%{{{lib}:{name}}}" if typ is None else f"%{{{lib}:{name}:{typ}}}"
        rx, names = _grok_regex(f"x={key};")
        assert [n for n, _ in names] == [name]
        assert names[0][1] == _GROK_TYPES.get(typ)
        assert _re.compile(rx).groupindex == {name: 1}

    @given(st.integers(min_value=-10**6, max_value=10**6),
           st.sampled_from(["INT", "NUMBER"]))
    @settings(max_examples=100, deadline=None)
    def test_grok_int_extraction_exact(self, n, lib):
        """A typed %{INT:v:int} capture extracts the embedded integer
        exactly through the Arrow kernel path."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from neural_search_ray.query.esql import _grok_regex

        rx, names = _grok_regex(f"val=%{{{lib}:v:int}} end")
        arr = pa.array([f"pre val={n} end post"])
        got = pc.cast(pc.struct_field(pc.extract_regex(arr, rx), "v"),
                      names[0][1])
        assert got.to_pylist() == [n]


class TestQueryStringProperties:
    @given(st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_never_hangs_or_crashes_unexpectedly(self, text):
        try:
            parse_query(text)
        except QueryStringError:
            pass

    @given(st.lists(
        st.sampled_from(["data", "query", "merge", "sort"]),
        min_size=1, max_size=4,
    ))
    @settings(max_examples=50, deadline=None)
    def test_and_chain_marks_all_must(self, terms):
        node = parse_query(" AND ".join(terms))
        if len(terms) == 1:
            assert node.kind == "term"
        else:
            assert node.kind == "group"
            assert all(k.occur == "must" for k in node.payload)


class TestCidrProperties:
    @given(st.integers(min_value=0, max_value=0xFFFFFFFF),
           st.integers(min_value=0, max_value=32))
    @settings(max_examples=200, deadline=None)
    def test_bounds_contain_network_address(self, addr, n):
        dotted = format_ipv4(np.array([addr], dtype=np.uint64))[0]
        lo, hi = parse_cidr(f"{dotted}/{n}")
        assert lo <= addr <= hi
        # the block size is exactly 2^(32-n)
        assert hi - lo == (0xFFFFFFFF >> n if n else 0xFFFFFFFF)

    @given(st.integers(min_value=0, max_value=0xFFFFFFFF),
           st.integers(min_value=0, max_value=32))
    @settings(max_examples=100, deadline=None)
    def test_mask_matches_bounds(self, addr, n):
        dotted = format_ipv4(np.array([addr], dtype=np.uint64))[0]
        lo, hi = parse_cidr(f"{dotted}/{n}")
        probe = np.array(
            [max(lo - 1, 0), lo, addr, hi, min(hi + 1, 0xFFFFFFFF)],
            dtype=np.uint64,
        )
        mask = cidr_filter_mask(probe, f"{dotted}/{n}")
        exp = (probe >= lo) & (probe <= hi)
        assert mask.tolist() == exp.tolist()


class TestFoldProperties:
    @given(st.text(
        alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x17F),
        max_size=30,
    ))
    @settings(max_examples=200, deadline=None)
    def test_fold_is_idempotent_and_ascii_fixed(self, s):
        from neural_search_ray.analysis.stem import fold_ascii_token

        once = fold_ascii_token(s)
        assert fold_ascii_token(once) == once  # idempotent
        if s.isascii():
            assert once == s  # ASCII is a fixed point
