"""Dated lookup + sector-range mapping + named object store
(reference J3, S18, S19).

  - ``Lookup`` structured/structured.py:330-373: per-source sorted
    (date, target) groups; value prevailing at a query date.
  - ``Sectoring`` readers/sectoring.py:28-170: (code-range start -> name)
    maps resolved by searchsorted right edge.
  - ``Store`` utils/store.py:19-128: named dump/load — parquet/json
    tables instead of pickles.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_science_spark.operators import asof_join


class Lookup:
    """J3: broadcast dated dimension; __call__-style scalar parity plus a
    set-at-a-time ``apply`` for joining whole fact frames."""

    def __init__(self, dim: DataFrame, key: str, date_col: str, target: str):
        self.dim = dim.select(key, date_col, target)
        self.key, self.date_col, self.target = key, date_col, target

    def apply(self, df: DataFrame, key_col: str, date_col: str) -> DataFrame:
        """Attach the target value prevailing at each row's date; rows
        earlier than every dim date get the group's FIRST value (the
        reference returns the earliest record then, structured.py:366-368)."""
        d = self.dim
        out = asof_join(
            df.withColumnRenamed(key_col, self.key) if key_col != self.key else df,
            d, by=self.key, left_on=date_col, right_on=self.date_col,
            right_tiebreak=self.target,
        )
        w = Window.partitionBy(self.key).orderBy(self.date_col)
        first = d.withColumn("__rn__", F.row_number().over(w)).filter(
            F.col("__rn__") == 1
        ).select(self.key, F.col(self.target).alias("__first__"))
        out = out.join(F.broadcast(first), self.key, "left").withColumn(
            self.target, F.coalesce(self.target, "__first__")
        ).drop("__first__")
        if key_col != self.key:
            out = out.withColumnRenamed(self.key, key_col)
        return out

    def __call__(self, spark, key_val, date: int):
        """Scalar parity API (drives one tiny job; use ``apply`` in plans)."""
        row = (
            self.dim.filter(F.col(self.key) == key_val)
            .filter(F.col(self.date_col) <= date)
            .orderBy(F.col(self.date_col).desc())
            .limit(1)
            .collect()
        )
        if not row:
            row = (
                self.dim.filter(F.col(self.key) == key_val)
                .orderBy(F.col(self.date_col).asc())
                .limit(1)
                .collect()
            )
        return row[0][self.target] if row else None


class Sectoring:
    """S18: code-range scheme; lookup = greatest range-start <= code
    (sectoring.py:128-133) as an as-of join on the code axis."""

    def __init__(self, ranges: DataFrame, code_col: str = "code",
                 name_col: str = "name"):
        self.ranges = ranges.select(
            F.col(code_col).alias("__start__"), F.col(name_col).alias("sector")
        ).withColumn("__grp__", F.lit(1))

    def apply(self, df: DataFrame, code_col: str) -> DataFrame:
        src = df.withColumn("__grp__", F.lit(1))
        out = asof_join(
            src, self.ranges, by="__grp__", left_on=code_col,
            right_on="__start__", strategy="join", right_tiebreak="sector",
        )
        return out.drop("__grp__")


class Store:
    """S19: named DataFrame store — parquet tables under a root dir, no
    pickles (store.py:19-128)."""

    def __init__(self, path: str, fmt: str = "parquet"):
        self.path, self.fmt = path, fmt

    def dump(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).format(self.fmt).save(os.path.join(self.path, name))

    def load(self, spark, name: str) -> DataFrame:
        return spark.read.format(self.fmt).load(os.path.join(self.path, name))

    def __contains__(self, name: str) -> bool:
        return os.path.isdir(os.path.join(self.path, name))
