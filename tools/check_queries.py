"""Local stand-in for the driver's correctness gate: run every queries()
entry at a given sf and compare with its oracle_sql() via DuckDB
(row-count + column set + order-insensitive value equality).

Usage: python tools/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                              else str(v))
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import logging

    import os

    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
                 include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception:
            print(f"FAIL {name}: query raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows, cols={list(got.columns)}")
            n_rows_only += 1
            continue
        try:
            want = normalize(con.execute(oracles[name]).fetchdf())
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            ok = False
        elif len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            ok = False
        else:
            for c in got.columns:
                if pd.api.types.is_float_dtype(got[c]):
                    same = np.allclose(got[c], want[c], rtol=0, atol=0, equal_nan=True)
                else:
                    same = got[c].equals(want[c])
                if not same:
                    diff = (got[c] != want[c])
                    print(f"FAIL {name}: column {c} differs in {int(diff.sum())} rows; "
                          f"sample got={got[c][diff].head(3).tolist()} "
                          f"want={want[c][diff].head(3).tolist()}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
