"""Text scrubbing kernels for web-corpus preprocessing: PII redaction
and whitespace normalization.

Both are pure vectorized maps over an Arrow string column. The regex
engine is RE2 on both sides of the oracle (pyarrow compute and DuckDB
both bind RE2), so patterns below are written RE2-only (no lookbehind)
and the SQL oracles apply the byte-identical patterns.

Scale: stateless ``map_batches`` stages — no shuffle, no driver
materialization; regexes are compiled once per process by Arrow.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns, shared verbatim with the SQL oracles
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
WS_RUN_RE = r"[ \t\r\n]+"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def _as_array(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(col, "")


def redact_pii(col: pa.Array | pa.ChunkedArray) -> pa.Table:
    """-> (text_redacted, n_emails, n_phones, n_ips).

    Order matters: emails first (an address contains dots that the IP
    pattern could otherwise chew on), then IPs, then phones.
    """
    s = _as_array(col)
    n_emails = pc.count_substring_regex(s, EMAIL_RE).cast(pa.int64())
    s = pc.replace_substring_regex(s, EMAIL_RE, EMAIL_TOKEN)
    n_ips = pc.count_substring_regex(s, IPV4_RE).cast(pa.int64())
    s = pc.replace_substring_regex(s, IPV4_RE, IP_TOKEN)
    n_phones = pc.count_substring_regex(s, PHONE_RE).cast(pa.int64())
    s = pc.replace_substring_regex(s, PHONE_RE, PHONE_TOKEN)
    return pa.table(
        {
            "text_redacted": s,
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
        }
    )


def normalize_ws(col: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Collapse whitespace runs to single spaces and trim; reports the
    number of characters removed."""
    s = _as_array(col)
    before = pc.utf8_length(s).cast(pa.int64())
    out = pc.utf8_trim_whitespace(pc.replace_substring_regex(s, WS_RUN_RE, " "))
    after = pc.utf8_length(out).cast(pa.int64())
    return pa.table(
        {
            "text_norm": out,
            "n_ws_removed": pc.subtract(before, after).cast(pa.int64()),
        }
    )
