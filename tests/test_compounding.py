"""Compounding semantics: min_count, intervals, delist rule, associativity."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.operators import (
    compound_intervals,
    compound_returns,
    delist_adjusted_ret,
)


def test_min_count_semantics(spark):
    pdf = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "date": [1, 2, 1, 2, 1],
            "ret": [0.1, 0.2, None, None, None],
        }
    )
    got = (
        compound_returns(spark.createDataFrame(pdf), "k")
        .toPandas()
        .sort_values("k")["ret"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, [1.1 * 1.2 - 1, np.nan, np.nan], equal_nan=True)


def test_matches_pandas_prod(spark, daily, daily_pdf):
    got = (
        compound_returns(daily, "permno", beg=20230101, end=20231231)
        .toPandas()
        .set_index("permno")["ret"]
        .sort_index()
    )
    sl = daily_pdf[(daily_pdf.date >= 20230101) & (daily_pdf.date <= 20231231)]
    want = (sl.assign(g=1 + sl.ret).groupby("permno")["g"].prod(min_count=1)) - 1
    np.testing.assert_allclose(
        got.to_numpy(), want.sort_index().to_numpy(), rtol=1e-9, equal_nan=True
    )


def test_associativity(spark, daily):
    """compound(a..b) o compound(b+1..c) == compound(a..c) (SURVEY §5)."""
    a = compound_returns(daily, "permno", beg=20220101, end=20220630, alias="r1")
    b = compound_returns(daily, "permno", beg=20220701, end=20221231, alias="r2")
    ab = compound_returns(daily, "permno", beg=20220101, end=20221231, alias="r12")
    j = (
        a.join(b, "permno", "outer")
        .join(ab, "permno", "outer")
        .withColumn(
            "combined",
            (1 + F.coalesce("r1", F.lit(0.0))) * (1 + F.coalesce("r2", F.lit(0.0))) - 1,
        )
        .toPandas()
    )
    mask = j["r12"].notna()
    np.testing.assert_allclose(
        j.loc[mask, "combined"], j.loc[mask, "r12"], rtol=1e-9
    )


def test_compound_intervals(spark, daily, daily_pdf):
    intervals = spark.createDataFrame(
        pd.DataFrame({"beg": [20220331, 20220630], "end": [20220630, 20220930]})
    )
    got = (
        compound_intervals(daily, intervals, "permno")
        .toPandas()
        .sort_values(["beg", "permno"])
    )
    for (beg, end), grp in got.groupby(["beg", "end"]):
        sl = daily_pdf[(daily_pdf.date > beg) & (daily_pdf.date <= end)]
        want = (sl.assign(g=1 + sl.ret).groupby("permno")["g"].prod(min_count=1)) - 1
        merged = grp.set_index("permno")["ret"]
        common = want.index.intersection(merged.index)
        np.testing.assert_allclose(
            merged.loc[common].to_numpy(),
            want.loc[common].to_numpy(),
            rtol=1e-9,
            equal_nan=True,
        )


def test_delist_default_truth_table(spark):
    pdf = pd.DataFrame(
        {
            "ret": [0.1, 0.1, 0.1, None, 0.1],
            "dlret": [None, None, 0.05, None, None],
            "dlstcd": [500, 100, 500, 560, 551],
        }
    )
    got = (
        spark.createDataFrame(pdf)
        .select(delist_adjusted_ret().alias("tot"))
        .toPandas()["tot"]
        .to_numpy()
    )
    want = [1.1 * 0.7 - 1, 0.1, 1.1 * 1.05 - 1, 0.7 - 1, 1.1 * 0.7 - 1]
    np.testing.assert_allclose(got, want, rtol=1e-12)
