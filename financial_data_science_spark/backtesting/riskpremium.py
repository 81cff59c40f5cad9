"""Fama-MacBeth risk premia (reference A9: backtesting/riskpremium.py:42-82).

Per rebalance date: cross-sectional OLS of excess returns on standardized
loadings; then time-series mean/sem/std of the per-date premia.  Here both
stages are hash aggregates: standardization is a full-partition window per
date (A6 frame), the per-date regression is pure-SQL normal equations (A8)
— no applyInPandas needed for the single-loading case the reference runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_science_spark.functions.stats import ols_aggs


def standardize_loadings(
    df: DataFrame, loading_cols: list[str], date_col: str = "rebaldate"
) -> DataFrame:
    """Z-score each loading within its cross-section (riskpremium.py:60-66)."""
    w = Window.partitionBy(date_col)
    out = df
    for c in loading_cols:
        mu, sd = F.avg(c).over(w), F.stddev_samp(c).over(w)
        # try_divide: a constant cross-section (sd == 0) z-scores to
        # NULL instead of raising under ANSI — degenerate dates drop out
        out = out.withColumn(c, F.try_divide(F.col(c) - mu, sd))
    return out


def fama_macbeth(
    panel: DataFrame,
    loading: str,
    ret_col: str = "ret",
    date_col: str = "rebaldate",
    standardize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """(per-date premia, summary): slope of ret on loading per date, then
    mean / std / sem / t over dates."""
    df = panel
    if standardize:
        df = standardize_loadings(df, [loading], date_col)
    by_date = df.groupBy(date_col).agg(*ols_aggs(ret_col, loading))
    summary = by_date.agg(
        F.count("slope").alias("n_dates"),
        F.avg("slope").alias("mean"),
        F.stddev_samp("slope").alias("std"),
        (F.stddev_samp("slope") / F.sqrt(F.count("slope"))).alias("sem"),
        (
            F.avg("slope") / (F.stddev_samp("slope") / F.sqrt(F.count("slope")))
        ).alias("tstat"),
    )
    return by_date, summary
