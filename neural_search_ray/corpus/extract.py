"""HTML → text extraction / validation stage.

North-rule invariant (BASELINE.json input_hint): the extracted ``text``
must be BYTE-IDENTICAL per url to the reference text. Our page html is a
deterministic wrapper (``html_of``), and ``extract_text`` inverts it
exactly; ``extract_text_stage`` re-derives text from html and (when the
table already carries a ``text`` column) verifies byte equality, failing
the batch loudly on any mismatch — the per-row invariant check.

The stage also DROPS the wide ``html`` column immediately (SURVEY.md
§7.4 "wide rows": html dominates block size; project it away before the
shuffle).
"""

from __future__ import annotations

import html as _html

import pyarrow as pa

_PRE = "<html><head><title>"
_MID = "</title></head><body><p>"
_POST = "</p></body></html>"


def html_of(url: str, text: str) -> bytes:
    """Deterministic page html for a (url, text)."""
    return (_PRE + _html.escape(url) + _MID + _html.escape(text) + _POST).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Exact inverse of html_of → the text payload (byte-identical)."""
    s = html_bytes.decode("utf-8")
    start = s.index(_MID) + len(_MID)
    end = s.rindex(_POST)
    return _html.unescape(s[start:end])


def extract_text_stage(batch: pa.Table) -> pa.Table:
    """map_batches fn: derive text from html, verify the invariant,
    project html away."""
    htmls = batch["html"].to_pylist()
    derived = [extract_text(h) for h in htmls]
    if "text" in batch.column_names:
        given = batch["text"].to_pylist()
        for i, (d, g) in enumerate(zip(derived, given)):
            if d != g:
                url = batch["url"][i].as_py() if "url" in batch.column_names else "?"
                raise ValueError(f"text extraction mismatch for url={url!r}")
    keep = [c for c in batch.column_names if c not in ("html", "text")]
    out = batch.select(keep)
    return out.append_column("text", pa.array(derived, type=pa.string()))
