"""Schema-coerced ingestion (reference S1/S2/S4, database/sql.py:17-71,
structured/structured.py:137-207).

Reference semantics re-expressed as a declarative column pipeline:
  - lowercase/strip column names, reorder to declared schema;
  - int columns: blanks -> 0, embedded '-' stripped (int-dates), cast;
  - float columns: invalid -> null (``pd.to_numeric(errors='coerce')``);
  - bool columns: blanks -> false;
  - string columns: ascii-forced, trimmed;
  - primary-key dedup (keep last after sort — database/sql.py:49-52);
  - keep/drop value filters (structured.py:177-201);
  - value replace map.

Everything is ``when/cast/regexp_replace`` expressions — one codegen'd
projection over the scan, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_science_spark.operators.prevailing import keep_extremum


def _coerce_col(c: Column, dt: T.DataType) -> Column:
    # try_cast everywhere: malformed input -> null (pandas errors='coerce'),
    # never a job-killing ANSI cast error mid-scan
    if isinstance(dt, (T.IntegerType, T.LongType, T.ShortType)):
        s = F.regexp_replace(F.trim(c.cast("string")), "-", "")
        return F.coalesce(
            F.when(s == "", F.lit(0)).otherwise(s.try_cast(dt)), F.lit(0).cast(dt)
        )
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return c.cast("string").try_cast(dt)  # invalid -> null
    if isinstance(dt, T.BooleanType):
        s = F.trim(c.cast("string"))
        return F.coalesce(
            F.when(s.isNull() | (s == ""), F.lit(False)).otherwise(s.try_cast(dt)),
            F.lit(False),
        )
    if isinstance(dt, T.StringType):
        # ascii-force (sql.py:64-66): strip non-ascii bytes, trim
        return F.trim(F.regexp_replace(c.cast("string"), "[^\\x00-\\x7F]", ""))
    return c.cast(dt)


def as_dtypes(
    df: DataFrame,
    schema: T.StructType,
    primary_keys: list[str] | None = None,
    keep: dict[str, list] | None = None,
    drop: dict[str, list] | None = None,
    replace: dict[str, dict] | None = None,
) -> DataFrame:
    """Coerce to declared schema with the reference's cleaning rules (S2)."""
    df = df.toDF(*[c.strip().lower() for c in df.columns])
    cols = []
    for field in schema.fields:
        src = F.col(field.name) if field.name in df.columns else F.lit(None)
        if replace and field.name in replace:
            mapping = replace[field.name]
            expr = src
            for old, new in mapping.items():
                expr = F.when(src == F.lit(old), F.lit(new)).otherwise(expr)
            src = expr
        cols.append(_coerce_col(src, field.dataType).alias(field.name))
    out = df.select(*cols)
    for col, vals in (drop or {}).items():
        out = out.filter(~F.col(col).isin(vals))
    for col, vals in (keep or {}).items():
        out = out.filter(F.col(col).isin(vals))
    if primary_keys:
        out = keep_extremum(out, primary_keys, [c for c in out.columns], keep="last")
    return out


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = True,
    encoding: str = "utf-8",
    **kwargs,
) -> DataFrame:
    """CSV load with declared (not inferred) schema (S1, structured.py:137-207).

    Reads every column as string first so the reference's coercion rules
    (blank->0, strip '-', ascii-force) apply before the typed cast.
    """
    raw_schema = T.StructType(
        [T.StructField(f.name, T.StringType(), True) for f in schema.fields]
    )
    raw = spark.read.csv(
        path, schema=raw_schema, sep=sep, header=header, encoding=encoding
    )
    return as_dtypes(raw, schema, **kwargs)


def upsert_append(
    existing: DataFrame, new: DataFrame, primary_keys: list[str]
) -> DataFrame:
    """INSERT IGNORE semantics (S4, sql.py:251-266): append only rows whose
    PK is absent from ``existing`` — a left-anti join, the parquet-era
    equivalent of the temp-table + INSERT IGNORE dance."""
    return existing.unionByName(
        new.join(existing.select(*primary_keys), primary_keys, "left_anti")
    )
