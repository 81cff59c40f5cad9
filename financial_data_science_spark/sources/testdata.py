"""Loaders for the driver-generated synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under /root/testdata/sf*/.

``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark reads
(under ``spark.sql.legacy.parquet.nanosAsLong=true``) as a long of
nanoseconds; we convert to a microsecond TimestampType by truncation —
the same conversion DuckDB applies casting TIMESTAMP_NS -> TIMESTAMP, so
oracle comparisons agree to the microsecond.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark refuses by
        # default (PARQUET_TYPE_ILLEGAL).  The conf is runtime-settable, so
        # set it here rather than relying on the session factory — the
        # harness may hand us an externally-built plain SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns epoch (~1.7e18) exceeds double's 53-bit
        # mantissa, so `/ 1000` would be off by ±1us on some rows
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # newer driver snapshots write naive timestamps (TIMESTAMP_NTZ), which
    # many builtins (unix_micros, double casts) refuse; with the session
    # timezone pinned to UTC the cast to TIMESTAMP preserves wall-clock
    # values exactly, matching how DuckDB reads the same parquet.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL front end)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
