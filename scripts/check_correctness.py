"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf via Ray, run the matching oracle_sql() in DuckDB over
the same parquet views, and compare row count, schema and sorted values.

Usage: python scripts/check_correctness.py [sf_dir] [only_query1,query2,...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
import pyarrow as pa

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(SF, t)}.parquet')"
        )

    import time

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    if len(sys.argv) > 2:
        only = set(sys.argv[2].split(","))
        unknown = only - set(qs)
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in only}
    failures = []
    t_start = time.monotonic()
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            got = canon(to_pandas(fn(SF)))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ray error: {e!r}"))
            print(f"[FAIL] {name}: ray error {e!r}")
            continue
        dt = time.monotonic() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows ({dt:.1f}s)")
            continue
        want = canon(con.execute(sqls[name]).fetch_df())
        status = []
        if len(got) != len(want):
            status.append(f"rowcount {len(got)} != {len(want)}")
        if list(got.columns) != list(want.columns):
            status.append(f"cols {list(got.columns)} != {list(want.columns)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                if str(a.dtype) != str(b.dtype):
                    status.append(f"dtype[{c}] {a.dtype} != {b.dtype}")
                if len(a) == len(b) and not a.equals(b):
                    neq = (a.astype(str) != b.astype(str))
                    if neq.any():
                        i = neq.idxmax()
                        status.append(f"value[{c}] row{i}: {a[i]!r} != {b[i]!r} ({int(neq.sum())} diffs)")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"[FAIL] {name}: {'; '.join(status)}")
        else:
            print(f"[OK]   {name}: {len(got)} rows ({dt:.1f}s)")

    ray.shutdown()
    print(f"\n{len(failures)} failures / {len(qs)} queries "
          f"({time.monotonic() - t_start:.0f}s total)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
