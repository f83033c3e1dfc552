"""Local correctness harness mimicking the driver: run each queries()
entry and its oracle_sql() side-by-side, compare row-count + schema +
order-insensitive values.

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [sf_dir] [name...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        tbl = pa.Table.from_pylist(result.take_all())
        return tbl.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 9)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("uint64")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(got)} (no oracle)")
            n_weak += 1
            continue
        try:
            want = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns) and all(
            str(got[c].dtype) == str(want[c].dtype) for c in got.columns
        )
        ok_vals = ok_rows and ok_schema and got.equals(want)
        if ok_vals:
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}, schema_ok={ok_schema}")
            if ok_schema and ok_rows:
                neq = ~(got == want).all(axis=1)
                print("  first diffs (ray vs oracle):")
                print(pd.concat([got[neq].head(3), want[neq].head(3)], keys=["ray", "sql"]))
            else:
                print("  ray dtypes:", dict(got.dtypes.astype(str)))
                print("  sql dtypes:", dict(want.dtypes.astype(str)))
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
