"""URL canonicalization — the standard web-corpus pre-dedup key.

Generic, batch-vectorized canonicalizer over an Arrow string column:
parse with one ``pc.extract_regex`` pass (scheme, host, port, path,
query), lowercase scheme/host, strip a leading ``www.``, drop the
scheme-default port (http:80 / https:443), drop tracking parameters
(``utm_*``), sort the remaining query parameters, and re-assemble.
Host and registrable domain (last two labels) come out alongside the
canonical URL so downstream stages can group by site.

Everything is Arrow C++ / numpy except one object-array sort over the
(tiny) flattened query-parameter list — no per-row Python parsing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_URL_RE = (
    r"^(?P<scheme>[^:]+)://(?P<host>[^/:?#]+)(?::(?P<port>[0-9]+))?"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?$"
)

DEFAULT_PORTS = {"http": "80", "https": "443"}
TRACKING_PREFIX = "utm_"


def _np_str(arr: pa.Array) -> np.ndarray:
    return np.asarray(arr.to_pylist(), dtype=object)


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Table:
    """-> (url_norm, host, domain) columns, one row per input URL.

    Unparseable inputs yield empty strings in all three columns.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    urls = pc.fill_null(urls, "")
    n = len(urls)
    parts = pc.extract_regex(urls, _URL_RE)
    valid = pc.is_valid(parts).to_numpy(zero_copy_only=False)
    fill = pa.array([""] * n, type=pa.string())
    if not valid.any():
        return pa.table({"url_norm": fill, "host": fill, "domain": fill})

    def field(name: str) -> pa.Array:
        return pc.fill_null(pc.struct_field(parts, name), "")

    scheme = pc.utf8_lower(field("scheme"))
    host = pc.utf8_lower(field("host"))
    # strip one leading www.
    host = pc.if_else(
        pc.starts_with(host, "www."), pc.utf8_slice_codeunits(host, 4), host
    )
    port = field("port")
    path = field("path")
    query = field("query")

    # drop default port for the scheme
    scheme_np = _np_str(scheme)
    port_np = _np_str(port)
    is_default = np.zeros(n, dtype=bool)
    for s, p in DEFAULT_PORTS.items():
        is_default |= (scheme_np == s) & (port_np == p)
    port_np[is_default] = ""

    # query params: split, drop empties + tracking params, sort, rejoin
    qsplit = pc.split_pattern(query, "&")
    offs = qsplit.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    parent = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    flat = _np_str(qsplit.flatten())
    flat_s = flat.astype(str)
    keepm = (flat_s != "") & ~np.char.startswith(flat_s, TRACKING_PREFIX)
    kp, kv = parent[keepm], flat[keepm]
    order = np.lexsort((kv, kp))
    kp, kv = kp[order], kv[order]
    counts = np.bincount(kp, minlength=n)
    qoffs = pa.array(np.concatenate(([0], np.cumsum(counts))), type=pa.int64())
    qlist = pa.LargeListArray.from_arrays(
        qoffs, pa.array(kv, type=pa.large_string())
    )
    qjoined = pc.binary_join(qlist, pa.scalar("&", type=pa.large_string())).cast(
        pa.string()
    )

    # vectorized assembly (Arrow C++ kernels end-to-end)
    port_arr = pa.array(port_np, type=pa.string())
    cat = lambda *parts: pc.binary_join_element_wise(*parts, "")  # noqa: E731
    hostport = pc.if_else(
        pc.equal(port_arr, ""), host, cat(host, ":", port_arr)
    )
    base = cat(scheme, "://", hostport, path)
    url_norm = pc.if_else(pc.equal(qjoined, ""), base, cat(base, "?", qjoined))
    dm = pc.extract_regex(host, r"(?P<dom>[^.]+\.[^.]+)$")
    domain = pc.if_else(
        pc.is_valid(dm), pc.fill_null(pc.struct_field(dm, "dom"), ""), host
    )
    valid_arr = pa.array(valid)
    empty = pa.scalar("", type=pa.string())
    return pa.table(
        {
            "url_norm": pc.if_else(valid_arr, url_norm, empty),
            "host": pc.if_else(valid_arr, host, empty),
            "domain": pc.if_else(valid_arr, domain, empty),
        }
    )
