"""ip field type + CIDR query + ip_range / ip_prefix aggs
(stages/ipfield.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from neural_search_ray.stages.ipfield import (
    cidr_filter_mask,
    format_ipv4,
    ip_prefix_agg,
    ip_range_agg,
    parse_cidr,
    synth_ip_stage,
)


class TestCidr:
    @pytest.mark.parametrize("cidr,lo,hi", [
        ("10.0.0.0/8", 10 << 24, (10 << 24) | 0xFFFFFF),
        ("192.168.1.0/24", 0xC0A80100, 0xC0A801FF),
        ("0.0.0.0/0", 0, 0xFFFFFFFF),
        ("1.2.3.4/32", 0x01020304, 0x01020304),
        ("255.255.255.255", 0xFFFFFFFF, 0xFFFFFFFF),
    ])
    def test_bounds(self, cidr, lo, hi):
        assert parse_cidr(cidr) == (lo, hi)

    def test_host_bits_masked(self):
        # 10.1.2.3/8 normalizes to the 10.0.0.0/8 network
        assert parse_cidr("10.1.2.3/8") == parse_cidr("10.0.0.0/8")

    @pytest.mark.parametrize("bad", ["10.0.0/8", "1.2.3.256/8", "1.2.3.4/33"])
    def test_bad_input(self, bad):
        with pytest.raises(ValueError):
            parse_cidr(bad)

    def test_mask(self):
        ips = np.array([0x0A000001, 0x0AFFFFFF, 0x0B000000], dtype=np.uint64)
        mask = cidr_filter_mask(ips, "10.0.0.0/8")
        assert mask.tolist() == [True, True, False]

    def test_format(self):
        assert format_ipv4(np.array([0x01020304, 0])) == ["1.2.3.4", "0.0.0.0"]


class TestAggs:
    def _ds(self, n=200):
        return ray.data.from_arrow(
            pa.table({"event_id": pa.array(range(n), pa.int64())})
        )

    def test_prefix_agg_counts_total(self):
        rows = ip_prefix_agg(self._ds(), prefix_len=4).take_all()
        assert sum(r["cnt"] for r in rows) == 200
        for r in rows:
            assert r["prefix"].endswith("/4")
            # /4 networks have zeroed low octets
            assert r["prefix"].split("/")[0].endswith(".0.0.0")

    def test_prefix_agg_matches_local(self):
        t = pa.table({"event_id": pa.array(range(500), pa.int64())})
        local = synth_ip_stage(t)["ip"].to_numpy().astype(np.uint64)
        exp = {}
        for b in (local >> np.uint64(24)).tolist():
            exp[b] = exp.get(b, 0) + 1
        rows = ip_prefix_agg(self._ds(500), prefix_len=8).take_all()
        got = {int(r["prefix"].split(".")[0]): r["cnt"] for r in rows}
        assert got == exp

    def test_range_agg_partition(self):
        ranges = [("low", None, "128.0.0.0"), ("high", "128.0.0.0", None)]
        rows = {r["range_key"]: r["cnt"]
                for r in ip_range_agg(self._ds(), ranges).take_all()}
        assert rows.get("low", 0) + rows.get("high", 0) == 200

    def test_range_agg_open_and_overlap(self):
        # overlapping ranges each count independently (ES semantics)
        ranges = [("all", None, None), ("low", None, "128.0.0.0")]
        rows = {r["range_key"]: r["cnt"]
                for r in ip_range_agg(self._ds(), ranges).take_all()}
        assert rows["all"] == 200
        assert 0 < rows["low"] < 200

    def test_bad_prefix_len(self):
        with pytest.raises(ValueError):
            ip_prefix_agg(self._ds(), prefix_len=0)
