"""Self-check harness: replicate the driver's Spark-vs-DuckDB comparison.

For every query in __spark_entry__.queries() with an oracle_sql() entry:
run both at the given sf dir, compare row count, schema (column names),
and order-insensitive values (rows sorted by all columns, exact equality;
floats compared bitwise after NaN normalization).

Usage: python selfcheck_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from sits_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame) -> str | None:
    if sorted(got.columns) != sorted(want.columns):
        return f"schema: spark={sorted(got.columns)} duck={sorted(want.columns)}"
    if len(got) != len(want):
        return f"rows: spark={len(got)} duck={len(want)}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        a, b = g[c].to_numpy(), w[c].to_numpy()
        # dtype-strict: the driver's hash is dtype-sensitive, so an
        # int64-vs-float64 pair (e.g. DuckDB HUGEINT sum vs Spark bigint)
        # must FAIL here even when np.array_equal would pass numerically.
        ka, kb = a.dtype.kind, b.dtype.kind
        if {ka, kb} <= {"i", "u", "f"} and (ka in "iu") != (kb in "iu"):
            return (
                f"dtype class mismatch in column {c}: "
                f"spark={a.dtype} duck={b.dtype} (int vs float — "
                f"cast the oracle SQL, e.g. CAST(sum(x) AS BIGINT))"
            )
        if a.dtype == np.float64 and b.dtype == np.float64:
            eq = np.array_equal(
                np.nan_to_num(a, nan=-1e308), np.nan_to_num(b, nan=-1e308)
            )
        else:
            try:
                eq = np.array_equal(a, b)
            except Exception:
                eq = list(a) == list(b)
        if not eq:
            bad = None
            for i in range(len(a)):
                if (a[i] != b[i]) and not (pd.isna(a[i]) and pd.isna(b[i])):
                    bad = i
                    break
            detail = f" first diff row {bad}: spark={a[bad]!r} duck={b[bad]!r}" if bad is not None else ""
            return f"values differ in column {c}:{detail}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_ok = n_bad = 0
    for name, builder in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            t0 = time.time()
            n = builder(spark, sf_dir).count()
            print(f"ROWS-ONLY {name}: {n} rows ({time.time()-t0:.1f}s)")
            continue
        t0 = time.time()
        try:
            got = builder(spark, sf_dir).toPandas()
            want = con.execute(oracles[name]).fetch_df()
            err = compare(got, want)
        except Exception as e:
            err = f"EXCEPTION {type(e).__name__}: {str(e)[:300]}"
        dt = time.time() - t0
        if err:
            n_bad += 1
            print(f"FAIL {name} ({dt:.1f}s): {err}")
        else:
            n_ok += 1
            print(f"OK   {name} ({dt:.1f}s, {len(got)} rows)")
    print(f"\n{n_ok} ok, {n_bad} fail")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
