"""Dev harness: compare the pages-corpus SQL oracles against the live Ray
queries at a given sf (default sf0.001).  Not part of the driver contract;
used while authoring ocr_ray/pages_oracle_sql.py.

Usage: python scripts/dev_pages_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:]


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
    from ocr_ray import pages_oracle_sql as po

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    sql_map = {
        "extract_pages": po.extract_pages_sql,
        "extract_stats": po.extract_stats_sql,
        "media_features": po.media_features_sql,
        "training_corpus": po.training_corpus_sql,
        "qc_rollup": po.qc_rollup_sql,
        "filter_stats": po.filter_stats_sql,
        "section_windows": po.section_windows_sql,
        "heading_windows": po.heading_windows_sql,
        "declarations_head": po.declarations_head_sql,
        "dual_engine_compare": po.dual_engine_compare_sql,
    }
    qs = entrymod.queries()
    bad = 0
    for name, sql_fn in sql_map.items():
        if ONLY and name not in ONLY:
            continue
        try:
            want = canon(con.execute(sql_fn()).fetch_df())
        except Exception as e:  # noqa: BLE001
            print(f"[SQLERR] {name}: {e}")
            bad += 1
            continue
        got_res = qs[name](SF)
        got = canon(got_res.to_pandas() if hasattr(got_res, "to_pandas") else got_res)
        if got.astype(str).equals(want.astype(str)) and list(got.columns) == list(want.columns) \
                and [str(d) for d in got.dtypes] == [str(d) for d in want.dtypes]:
            print(f"[OK]   {name}: {len(got)} rows")
            continue
        bad += 1
        print(f"[FAIL] {name}: got {len(got)} want {len(want)}")
        if list(got.columns) != list(want.columns):
            print("  cols got ", list(got.columns))
            print("  cols want", list(want.columns))
        elif len(got) == len(want):
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    print(f"  dtype[{c}]: {got[c].dtype} != {want[c].dtype}")
                neq = got[c].astype(str) != want[c].astype(str)
                if neq.any():
                    i = neq.idxmax()
                    print(f"  diff[{c}] row{i}: {got[c][i]!r} != {want[c][i]!r} ({int(neq.sum())})")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
