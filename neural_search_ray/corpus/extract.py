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

import re as _re

_PRE = "<html><head><title>"
_MID = "</title></head><body><p>"
_POST = "</p></body></html>"
_MID_RE = _re.escape(_MID)
_POST_RE = _re.escape(_POST)


def html_of(url: str, text: str) -> bytes:
    """Deterministic page html for a (url, text). quote=False: only
    & < > need escaping in text nodes (apostrophes stay literal, keeping
    the vectorized no-escape path byte-identical for quote-bearing text)."""
    return (
        _PRE + _html.escape(url, quote=False) + _MID
        + _html.escape(text, quote=False) + _POST
    ).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Exact inverse of html_of → the text payload (byte-identical)."""
    s = html_bytes.decode("utf-8")
    start = s.index(_MID) + len(_MID)
    end = s.rindex(_POST)
    return _html.unescape(s[start:end])


def extract_text_stage(batch: pa.Table) -> pa.Table:
    """map_batches fn: derive text from html, verify the invariant,
    project html away (SURVEY.md §7.4 wide-rows note).

    Vectorized: strip the prefix (up to and including _MID) and the fixed
    _POST suffix with Arrow C++ regex replaces; rows containing HTML
    entities (&) fall back to the exact Python inverse."""
    import pyarrow.compute as pc

    from ..runtime import ensure_worker_tuned

    ensure_worker_tuned()
    html_col = batch["html"]
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    s = html_col.cast(pa.string())
    stripped = pc.replace_substring_regex(s, "^.*?" + _MID_RE, "", max_replacements=1)
    derived = pc.replace_substring_regex(stripped, _POST_RE + "$", "", max_replacements=1)
    has_entity = pc.not_equal(pc.count_substring(derived, "&"), 0)
    if pc.any(has_entity).as_py():
        mask = has_entity.to_numpy(zero_copy_only=False)
        import numpy as np

        idx = np.flatnonzero(mask)
        fixed = [extract_text(html_col[int(i)].as_py()) for i in idx]
        d = derived.to_pylist()
        for i, v in zip(idx, fixed):
            d[int(i)] = v
        derived = pa.array(d, type=pa.string())
    if "text" in batch.column_names:
        if not pc.all(pc.equal(derived, batch["text"].combine_chunks()
                               if isinstance(batch["text"], pa.ChunkedArray)
                               else batch["text"])).as_py():
            bad = pc.not_equal(derived, batch["text"])
            i = int(pc.index(bad, True).as_py())
            url = batch["url"][i].as_py() if "url" in batch.column_names else "?"
            raise ValueError(f"text extraction mismatch for url={url!r}")
    keep = [c for c in batch.column_names if c not in ("html", "text")]
    out = batch.select(keep)
    return out.append_column("text", derived)
