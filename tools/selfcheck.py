"""Emulate the driver's correctness gate: run every queries() entry and its
DuckDB oracle side-by-side on one sf dir; compare row count, column names and
order-insensitive values.  Usage: python tools/selfcheck.py [sf_dir] [names…]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import ray


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    df = obj.to_pandas()  # ray Dataset
    if len(df.columns) == 0 and len(df) == 0:
        # Ray Data quirk: to_pandas() of an all-empty-block dataset drops
        # the (known) schema; rebuild the typed empty frame from it
        sch = obj.schema()
        if sch is not None and sch.names:
            df = pa.schema(list(zip(sch.names, sch.types))
                           ).empty_table().to_pandas()
    return df


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        x, y = a[c].tolist(), b[c].tolist()
        for u, v in zip(x, y):
            try:
                una, vna = pd.isna(u), pd.isna(v)
                # array-valued cell on EITHER side: the NA test is
                # element-wise there — fall through to value compare
                if not (isinstance(una, bool) and isinstance(vna, bool)):
                    una = vna = False
            except (TypeError, ValueError):
                una = vna = False
            if una or vna:
                if una and vna:
                    continue
                return False
            if isinstance(u, float) or isinstance(v, float):
                try:
                    fu, fv = float(u), float(v)
                except (TypeError, ValueError):
                    if str(u) != str(v):
                        return False
                    continue
                if math.isnan(fu) and math.isnan(fv):
                    continue
                if not math.isclose(fu, fv, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif u != v:
                return False
    return True


def main():
    args = list(sys.argv[1:])
    window_only = "--window" in args
    if window_only:
        args.remove("--window")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             log_to_driver=False)
    from trustfuse_ray.pipelines.queries import oracle_sql_map, queries_map

    qmap = queries_map()
    if window_only:
        # exactly the driver's 50-slot correctness window, in order
        from trustfuse_ray.pipelines.queries import _DRIVER_WINDOW
        qmap = {k: qmap[k] for k in _DRIVER_WINDOW}
    omap = oracle_sql_map(sf_dir)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    failures = 0
    for name, fn in qmap.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"ERROR  {name}: ray side failed: {type(e).__name__} {e}")
            failures += 1
            continue
        if name not in omap:
            print(f"rowsonly {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            want = normalize(con.sql(omap[name]).df())
        except Exception as e:
            print(f"ERROR  {name}: oracle failed: {type(e).__name__} {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL   {name}: cols ray={list(got.columns)} "
                  f"sql={list(want.columns)}")
            failures += 1
        elif len(got) != len(want):
            print(f"FAIL   {name}: rows ray={len(got)} sql={len(want)}")
            failures += 1
        elif not values_equal(got, want):
            print(f"FAIL   {name}: values differ")
            diff = got.compare(want) if got.shape == want.shape else None
            if diff is not None and len(diff):
                print(diff.head(5))
            failures += 1
        else:
            print(f"OK     {name}: {len(got)} rows")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
