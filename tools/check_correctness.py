"""Local replica of the driver's t2 correctness gate.

Runs every `queries()` entry at sf0.01 via Spark AND its `oracle_sql()`
via DuckDB on the same parquet, then compares three ways:

1. row count + column names;
2. numeric comparison (columns sorted by name, rows sorted by all
   columns; floats compare exactly after the queries' own rounding);
3. STRICT value-hash comparison: every cell stringified canonically
   with NO pandas dtype coercion, mimicking the driver's hasher.  This
   is the layer that catches oracle *typing* slips the numeric compare
   forgives — e.g. DuckDB typing an uncast `sum(BIGINT)` as HUGEINT,
   which pandas renders float64 ("123.0" vs Spark's "123").  The r6
   gate shipped exactly that bug (bpe_* oracles) because the old
   checker coerced integer dtypes to Int64 before comparing.

Additionally each oracle's output schema is audited via DuckDB's
relation types: any HUGEINT/UHUGEINT/DECIMAL output column fails
immediately with the offending column named, before values are even
fetched — those types hash differently from Spark's bigint/double.

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


_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def audit_oracle_types(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Names of oracle output columns whose DuckDB type would hash
    differently from any Spark type (HUGEINT/DECIMAL family)."""
    rel = con.sql(sql)
    return [
        f"{c}::{t}"
        for c, t in zip(rel.columns, (str(t).upper() for t in rel.types))
        if any(t.startswith(b) for b in _BAD_ORACLE_TYPES)
    ]


def _strict_cell(v) -> str:
    """Canonical driver-style stringification of one cell, no coercion."""
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_strict_cell(x) for x in v) + "]"
    if v is None or v is pd.NaT or v is pd.NA:
        return "<null>"
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "<null>"
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def strict_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_strict_cell(v) for v in rec)
        for rec in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def strict_compare(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    g, w = strict_rows(got), strict_rows(want)
    if g == w:
        return []
    for i, (a, b) in enumerate(zip(g, w)):
        if a != b:
            return [f"strict-hash: first diff at sorted row {i}: spark={a} duckdb={b}"]
    return [f"strict-hash: row sets differ (len {len(g)} vs {len(w)})"]


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
    # logging is NOT query-affecting conf, so demoting the unpartitioned-
    # window warning here keeps the plain-session discipline while
    # matching get_spark's rationale: every remaining unpartitioned
    # window is bounded-by-construction or guarded by the executor
    # assert (operators/windows.py), which is strictly more informative
    try:
        jvm = spark.sparkContext._jvm
        for cls in ("WindowExec", "WindowExecBase", "WindowGroupLimitExec"):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                f"org.apache.spark.sql.execution.window.{cls}",
                jvm.org.apache.logging.log4j.Level.ERROR,
            )
    except Exception:
        pass
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
            bad_types = audit_oracle_types(con, ORACLE[name])
            want = con.execute(ORACLE[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb raised {e}")
            n_fail += 1
            continue
        if bad_types:
            print(
                f"FAIL  {name}: oracle emits driver-hostile types "
                f"{bad_types} (cast to BIGINT/DOUBLE)"
            )
            n_fail += 1
            continue
        problems = compare(name, got, want)
        if not problems:
            problems = strict_compare(got, want)
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
