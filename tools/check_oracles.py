"""Driver-style oracle check: run each queries() entry via Ray and its
oracle_sql() via DuckDB on the same sf dir; compare row count, schema,
and an order-insensitive value hash (columns sorted by name, rows
sorted by all columns).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(f"dtype[{c}]: ray={a[c].dtype} sql={b[c].dtype}")
    if len(a) == len(b):
        for c in a.columns:
            if not a[c].equals(b[c]):
                neq = (a[c] != b[c])
                try:
                    idx = neq[neq].index[0]
                    problems.append(
                        f"values[{c}]: first diff at row {idx}: {a[c][idx]!r} vs {b[c][idx]!r}"
                    )
                except IndexError:
                    problems.append(f"values[{c}]: equals()==False (NaN or dtype)")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        import os

        cpus = int(os.environ.get("RAY_GRAFT_CPUS", "8"))
        ray.init(
            address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR"
        )

    sys.path.insert(0, "/root/repo")
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    queries = mod.queries()
    oracles = mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import time as _time

    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = _time.perf_counter()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: ray raised {type(e).__name__}: {e}")
            failed.append(name)
            continue
        t_ray = _time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(ray_df)} rows) [ray {t_ray:.2f}s]")
            continue
        t0 = _time.perf_counter()
        sql_df = con.execute(oracles[name]).fetchdf()
        t_sql = _time.perf_counter() - t0
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
            failed.append(name)
        else:
            print(
                f"OK   {name}: {len(ray_df)} rows match oracle "
                f"[ray {t_ray:.2f}s, sql {t_sql:.2f}s]"
            )
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all queries consistent with oracles")


if __name__ == "__main__":
    main()
