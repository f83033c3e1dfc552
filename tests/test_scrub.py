"""Unit tests for corpus/scrub.py (PII redaction, whitespace norm)."""

from __future__ import annotations

import pyarrow as pa

from neural_search_ray.corpus.scrub import normalize_ws, redact_pii


def test_redact_pii_all_kinds():
    out = redact_pii(
        pa.array(
            [
                "mail a.b+c@ex-1.org and b@x.io now",
                "server at 10.0.3.255 and 192.168.1.1",
                "call 555-0134 or 800-1234",
                "clean text",
                None,
            ]
        )
    ).to_pydict()
    assert out["text_redacted"][0] == "mail <EMAIL> and <EMAIL> now"
    assert out["n_emails"] == [2, 0, 0, 0, 0]
    assert out["text_redacted"][1] == "server at <IP> and <IP>"
    assert out["n_ips"] == [0, 2, 0, 0, 0]
    assert out["text_redacted"][2] == "call <PHONE> or <PHONE>"
    assert out["n_phones"] == [0, 0, 2, 0, 0]
    assert out["text_redacted"][3] == "clean text"
    assert out["text_redacted"][4] == ""


def test_redact_pii_email_before_ip():
    # the dots in an email domain must not be half-eaten by the IP pass
    out = redact_pii(pa.array(["x 1.2.3.4@foo.com y"])).to_pydict()
    assert out["n_emails"] == [1]
    assert out["text_redacted"] == ["x <EMAIL> y"]


def test_normalize_ws():
    out = normalize_ws(
        pa.array(["  a\t\tb \n c  ", "x", "", None, " \t "])
    ).to_pydict()
    assert out["text_norm"] == ["a b c", "x", "", "", ""]
    assert out["n_ws_removed"][0] == len("  a\t\tb \n c  ") - len("a b c")
    assert out["n_ws_removed"][1] == 0


def test_scrub_entries_registered():
    from neural_search_ray.pipelines.suite import build_oracle_sql, build_queries

    qs, sqls = build_queries(), build_oracle_sql()
    for name in ("pii_redact", "text_normalize"):
        assert name in qs and name in sqls
