"""Driver-style side-by-side check: each queries() result vs its
oracle_sql() in DuckDB (row count + schema + order-insensitive values).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(obj, Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, ours: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(oracle.columns):
        problems.append(f"schema: {sorted(ours.columns)} vs {sorted(oracle.columns)}")
        return problems
    # dtype-strict: the driver's value hash is representation-sensitive
    # (int64 6 vs float64 6.0 hash differently), so exact dtype parity
    # is part of the contract, checked BEFORE canonicalization.
    for c in sorted(ours.columns):
        if str(ours[c].dtype) != str(oracle[c].dtype):
            problems.append(f"col {c}: dtype {ours[c].dtype} vs oracle {oracle[c].dtype}")
    if len(ours) != len(oracle):
        problems.append(f"rows: {len(ours)} vs {len(oracle)}")
    a, b = canon(ours), canon(oracle)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                eq = np.array_equal(av.astype(np.float64), bv.astype(np.float64))
                if not eq:
                    close = np.allclose(av.astype(np.float64), bv.astype(np.float64), rtol=0, atol=1e-12)
                    problems.append(
                        f"col {c}: exact float mismatch"
                        + (" (within 1e-12)" if close else " (LARGE)")
                    )
            else:
                eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
                if not eq.all():
                    bad = np.nonzero(~eq)[0][:3]
                    problems.append(f"col {c}: value mismatch at rows {bad}: {av[bad]} vs {bv[bad]}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from crawler_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"✗ {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        sql = ORACLE_SQL.get(name)
        if sql is None:
            print(f"○ {name}: rows-only ({len(ours)} rows, {dt:.2f}s)")
            continue
        oracle = con.sql(sql).df()
        problems = compare(name, ours, oracle)
        if problems:
            failures += 1
            print(f"✗ {name}: " + "; ".join(problems))
        else:
            print(f"✓ {name}: {len(ours)} rows match ({dt:.2f}s)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
