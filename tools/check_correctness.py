"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry at sf0.01 via Spark AND its `oracle_sql()`
via DuckDB on the same parquet, then compares: row count, column names,
and values (columns sorted by name, rows sorted by all columns).  Floats
compare exactly after the queries' own rounding; residual diffs are
reported with max-abs-diff so rounding scale can be tuned.

Usage: PYTHONPATH=/root/repo python tools/check_correctness.py [names...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rowcount spark={len(got)} duckdb={len(want)}")
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns spark={sorted(got.columns)} duckdb={sorted(want.columns)}")
        return problems
    g, w = normalize(got), normalize(want)
    if len(g) == len(w):
        for c in g.columns:
            gc, wc = g[c], w[c]
            if pd.api.types.is_float_dtype(gc):
                a, b = gc.to_numpy(dtype=float), wc.to_numpy(dtype=float)
                eq = np.isclose(a, b, rtol=0, atol=0, equal_nan=True)
                if not eq.all():
                    maxd = np.nanmax(np.abs(a - b))
                    problems.append(f"col {c}: {np.sum(~eq)} diffs, maxabs={maxd:.3e}")
            else:
                neq = ~((gc == wc) | (gc.isna() & wc.isna()))
                if neq.any():
                    i = int(np.argmax(neq.to_numpy()))
                    problems.append(
                        f"col {c}: {int(neq.sum())} diffs, first at row {i}: "
                        f"spark={gc.iloc[i]!r} duckdb={wc.iloc[i]!r}"
                    )
    return problems


def main() -> int:
    # Deliberately a PLAIN session (not the repo's get_spark factory): the
    # driver's harness builds its own SparkSession without our conf, so any
    # query that only works under factory conf would pass here but fail there.
    from pyspark.sql import SparkSession

    from financial_data_science_spark.queries import ORACLE, Q

    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("check_correctness")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duck_connection()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in Q.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"ROWS  {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            want = con.execute(ORACLE[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {e}")
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems) + f" [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(got)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
