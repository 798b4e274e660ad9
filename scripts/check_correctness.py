"""Local replica of the driver's correctness gate: run every queries() entry
against its oracle_sql() with DuckDB at sf0.01; compare row count, schema
(sorted column names), and order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            raw = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(raw)} rows in {el:.1f}s")
            continue
        got = normalize(raw)
        want = normalize(con.sql(oracles[name]).df())
        status = "OK"
        dtype_kinds_got = [got[c].dtype.kind for c in got.columns]
        dtype_kinds_want = [want[c].dtype.kind for c in want.columns]
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA MISMATCH got={list(got.columns)} want={list(want.columns)}"
        elif dtype_kinds_got != dtype_kinds_want:
            # the driver's value hash distinguishes int64 from float64 —
            # DuckDB SUM(BIGINT)→HUGEINT→float64 was the round-1 trap
            status = (
                f"DTYPE-KIND MISMATCH got={dict(zip(got.columns, dtype_kinds_got))} "
                f"want={dict(zip(want.columns, dtype_kinds_want))}"
            )
        elif len(got) != len(want):
            status = f"ROWCOUNT {len(got)} != {len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True),
                    want.reset_index(drop=True),
                    check_dtype=False,
                    check_exact=True,
                )
            except AssertionError as e:
                status = "VALUES MISMATCH: " + str(e).split("\n")[0]
                for i in range(min(len(got), len(want))):
                    if not got.iloc[i].equals(want.iloc[i]):
                        status += f" | first diff row {i}: got={got.iloc[i].to_dict()} want={want.iloc[i].to_dict()}"
                        break
        mark = "OK  " if status == "OK" else "FAIL"
        if status != "OK":
            failures += 1
        print(f"[{mark}] {name}: {len(got)} rows in {el:.1f}s {'' if status=='OK' else status}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
