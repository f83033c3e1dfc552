"""``ip`` field type + ip_range / ip_prefix aggregations.

Public-surface analogue: Elasticsearch's ``ip`` field type with CIDR
term queries, the ``ip_range`` aggregation (named address ranges) and
the ``ip_prefix`` aggregation (bucket by the first *n* bits) — core
mapping/agg surfaces the reference plugin's host exposes alongside the
plugin's own types (registered via the same mapper/agg SPI seams,
`plugin/NeuralSearch.java:455-467`).

Addresses are IPv4 as uint32; parsing/formatting is vectorized numpy
byte arithmetic (no per-row inet library).  CIDR semantics: ``a.b.c.d/n``
matches addresses whose top-``n`` bits equal the network's.

Synthetic fixture: the events table has no address column, so
``synth_ip_stage`` derives one deterministically per event via the
exact Mersenne-61 universal hash already mirrored in SQL by the
minhash oracle chain (dedup/common.py universal_hash): ip =
((A*event_id + B) mod (2^61-1)) & 0xFFFFFFFF.  Fully vectorized and
HUGEINT-expressible, so every aggregate is value-exact against DuckDB.

Scale shape: both aggregations are the partial+final pattern — an
Arrow/numpy combiner inside map_batches (one row per bucket per
batch), then ONE keyed exchange over bucket ids.  Bucket universes are
bounded (2^prefix_len / number of named ranges), never corpus-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup.common import universal_hash

__all__ = [
    "IP_HASH_A", "IP_HASH_B", "synth_ip_stage", "parse_cidr",
    "cidr_filter_mask", "ip_range_agg", "ip_prefix_agg", "format_ipv4",
]

# pinned public LCG constants (glibc rand): a < 2^31, b < 2^32 as
# universal_hash requires; the SQL oracle repeats them verbatim
IP_HASH_A = 1103515245
IP_HASH_B = 12345

_U32 = np.uint64(0xFFFFFFFF)


def synth_ip_stage(batch: pa.Table, id_col: str = "event_id") -> pa.Table:
    """Append a deterministic uint32 ``ip`` column derived from the id
    column — the fixture stage for the ip-field entries."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
    ip = (universal_hash(ids, IP_HASH_A, IP_HASH_B) & _U32).astype(np.int64)
    return batch.append_column("ip", pa.array(ip, type=pa.int64()))


def format_ipv4(ip: np.ndarray) -> list[str]:
    """Dotted-quad rendering of uint32 addresses (vectorized byte
    extraction; the join is per-UNIQUE-bucket, not per-row)."""
    ip = np.asarray(ip, dtype=np.uint64)
    a = (ip >> np.uint64(24)) & np.uint64(255)
    b = (ip >> np.uint64(16)) & np.uint64(255)
    c = (ip >> np.uint64(8)) & np.uint64(255)
    d = ip & np.uint64(255)
    return [f"{int(w)}.{int(x)}.{int(y)}.{int(z)}"
            for w, x, y, z in zip(a, b, c, d)]


def parse_cidr(cidr: str) -> tuple[int, int]:
    """``a.b.c.d/n`` -> inclusive [lo, hi] uint32 bounds."""
    addr, _, bits = cidr.partition("/")
    n = int(bits) if bits else 32
    if not 0 <= n <= 32:
        raise ValueError(f"bad prefix length in {cidr!r}")
    parts = [int(p) for p in addr.split(".")]
    if len(parts) != 4 or any(not 0 <= p <= 255 for p in parts):
        raise ValueError(f"bad IPv4 address in {cidr!r}")
    base = (parts[0] << 24) | (parts[1] << 16) | (parts[2] << 8) | parts[3]
    mask = ((1 << n) - 1) << (32 - n) if n else 0
    lo = base & mask
    hi = lo | (0xFFFFFFFF >> n if n else 0xFFFFFFFF)
    return lo, hi


def cidr_filter_mask(ip: np.ndarray, cidr: str) -> np.ndarray:
    """Boolean mask of addresses inside the CIDR block (term query on an
    ip field with a /n value)."""
    lo, hi = parse_cidr(cidr)
    ip = np.asarray(ip, dtype=np.uint64)
    return (ip >= np.uint64(lo)) & (ip <= np.uint64(hi))


def ip_range_agg(
    ds, ranges: list[tuple[str, str | None, str | None]],
    id_col: str = "event_id",
):
    """ip_range aggregation: named [from, to) address ranges (ES
    semantics: ``from`` inclusive, ``to`` exclusive, either open).

    Returns a ray.data.Dataset of (range_key, cnt).  Partial counts per
    batch (one row per named range), one small groupby(range_key) sum.
    """
    import ray.data
    from ray.data.aggregate import Sum

    bounds = []
    for key, frm, to in ranges:
        lo = parse_cidr(frm + "/32")[0] if frm is not None else 0
        hi = parse_cidr(to + "/32")[0] if to is not None else 1 << 32
        bounds.append((key, lo, hi))

    def partial(batch: pa.Table) -> pa.Table:
        out = synth_ip_stage(batch, id_col=id_col)
        ip = out["ip"].to_numpy().astype(np.uint64)
        keys, cnts = [], []
        for key, lo, hi in bounds:
            keys.append(key)
            cnts.append(
                int(((ip >= np.uint64(lo)) & (ip < np.uint64(hi))).sum())
            )
        return pa.table({
            "range_key": pa.array(keys, pa.string()),
            "cnt": pa.array(cnts, pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("range_key")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


def ip_prefix_agg(ds, prefix_len: int, id_col: str = "event_id"):
    """ip_prefix aggregation: bucket addresses by their top
    ``prefix_len`` bits; emits (prefix, cnt) with the dotted network
    address of each bucket (ES renders ``a.b.c.d/n`` keys).

    Partial: numpy bincount over the 2^prefix_len bucket ids per batch
    (one row per OCCUPIED bucket), then one keyed sum exchange.
    """
    import ray.data
    from ray.data.aggregate import Sum

    if not 1 <= prefix_len <= 32:
        raise ValueError("prefix_len must be in [1, 32]")
    shift = np.uint64(32 - prefix_len)

    def partial(batch: pa.Table) -> pa.Table:
        out = synth_ip_stage(batch, id_col=id_col)
        ip = out["ip"].to_numpy().astype(np.uint64)
        bucket = (ip >> shift).astype(np.int64)
        uniq, cnt = np.unique(bucket, return_counts=True)
        return pa.table({
            "bucket": pa.array(uniq, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        bucket = batch["bucket"].to_numpy().astype(np.uint64)
        net = bucket << shift
        return pa.table({
            "prefix": pa.array(
                [f"{s}/{prefix_len}" for s in format_ipv4(net)], pa.string()
            ),
            "cnt": batch["cnt"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
