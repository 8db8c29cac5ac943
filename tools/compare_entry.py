"""Side-by-side check of __spark_entry__ queries() vs oracle_sql(),
emulating the driver's correctness gate (row-count + schema + sorted
value comparison). Usage: python tools/compare_entry.py [sf_dir] [names...]"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from micce_search_engine_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, spark_df, sql, con) -> str:
    got = canon(spark_df.toPandas())
    exp = canon(con.sql(sql).df())
    if len(got) != len(exp):
        return f"ROWS {len(got)} != {len(exp)}"
    if list(got.columns) != list(exp.columns):
        return f"COLS {list(got.columns)} != {list(exp.columns)}"
    for c in got.columns:
        g, x = got[c], exp[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(x.dtype, np.floating):
            ok = np.allclose(
                g.astype(float), x.astype(float), rtol=0, atol=0, equal_nan=True
            )
            if not ok:
                bad = (g.astype(float) != x.astype(float)).idxmax()
                return f"VAL[{c}] row{bad}: {g[bad]!r} != {x[bad]!r}"
        else:
            if not (g.astype(str) == x.astype(str)).all():
                bad = (g.astype(str) != x.astype(str)).idxmax()
                return f"VAL[{c}] row{bad}: {g[bad]!r} != {x[bad]!r}"
    return "OK"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("compare-entry", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create or replace view {t} as select * from '{sf}/{t}.parquet'")
    qs = E.queries()
    oracles = E.oracle_sql()
    fails = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf)
            if name in oracles:
                status = compare(name, sdf, oracles[name], con)
            else:
                status = f"rows-only ({sdf.count()} rows)"
        except Exception as e:
            status = f"EXC {type(e).__name__}: {str(e)[:200]}"
        dt = time.monotonic() - t0
        if status != "OK" and not status.startswith("rows-only"):
            fails += 1
        print(f"{name:24s} {dt:6.1f}s  {status}")
    print("FAILS:", fails)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
