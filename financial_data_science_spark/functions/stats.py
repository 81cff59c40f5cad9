"""Statistical aggregates: weighted mean, per-group OLS, risk measures.

Reference semantics:
  - NaN-aware weighted mean recipes/filters.py:208-228 (A5).
  - per-group closed-form OLS recipes/econs.py:238-265 (A8) — used by
    Fama-MacBeth risk premia backtesting/riskpremium.py:42-82 (A9).
  - risk measures (historical VaR/ES, moments) recipes/finance.py:309-389
    (A17).

Spark realization: pure-SQL normal equations (sums of cross products) — a
single hash aggregate, no UDF, exact for the 1-2 regressor cases the
reference uses; ``applyInPandas`` remains the fallback for many-regressor
designs (operators exposed separately).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_mean(x: str | Column, w: str | Column, alias: str = "wmean") -> Column:
    """NaN-aware weighted mean: weights of null-x rows excluded (A5)."""
    xc = F.col(x) if isinstance(x, str) else x
    wc = F.col(w) if isinstance(w, str) else w
    return (
        F.sum(F.when(xc.isNotNull(), xc * wc))
        / F.sum(F.when(xc.isNotNull(), wc))
    ).alias(alias)


def ols_aggs(y: str | Column, x: str | Column) -> list[Column]:
    """Simple-OLS slope/intercept/r2 per group via normal equations (A8).

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); rows with a null on either
    side are excluded pairwise (matches the reference's dropna).
    """
    yc = F.col(y) if isinstance(y, str) else y
    xc = F.col(x) if isinstance(x, str) else x
    both = xc.isNotNull() & yc.isNotNull()
    xv = F.when(both, xc)
    yv = F.when(both, yc)
    n = F.count(xv).cast("double")
    sx, sy = F.sum(xv), F.sum(yv)
    sxx, syy, sxy = F.sum(xv * xv), F.sum(yv * yv), F.sum(xv * yv)
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    r_denom = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r2 = F.when(r_denom > 0, F.pow(n * sxy - sx * sy, 2) / r_denom)
    return [
        n.cast("long").alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    ]


def group_ols(df: DataFrame, keys: list[str] | str, y: str, x: str) -> DataFrame:
    """Per-group simple OLS, one hash aggregate (A8/A9 building block)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(*ols_aggs(y, x))


def standardize(df: DataFrame, cols: list[str], keys: list[str] | str) -> DataFrame:
    """Cross-sectional z-score within key groups (A9 loading standardization,
    riskpremium.py:60-66) via full-partition window aggregates."""
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    w = Window.partitionBy(*keys)
    out = df
    for c in cols:
        mu = F.avg(F.col(c)).over(w)
        sd = F.stddev_samp(F.col(c)).over(w)
        out = out.withColumn(c, (F.col(c) - mu) / sd)
    return out


def risk_summary(
    df: DataFrame, keys: list[str] | str, ret: str = "ret", alpha: float = 0.05
) -> DataFrame:
    """Historical VaR/ES + moments per group (A17, finance.py:309-389).

    VaR = -(alpha quantile); ES = -mean(returns <= quantile).  The quantile
    is attached via a full-partition window (one shuffle) so the tail mean
    is conditioned without a second scan-join.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    r = F.col(ret)
    q = F.percentile(r, F.lit(alpha)).over(Window.partitionBy(*keys))
    with_q = df.withColumn("__q__", q)
    return with_q.groupBy(*keys).agg(
        F.count(r).alias("n"),
        F.avg(r).alias("mean"),
        F.stddev_samp(r).alias("std"),
        F.skewness(r).alias("skew"),
        F.kurtosis(r).alias("kurt"),
        (-F.first("__q__")).alias("var"),
        (-F.avg(F.when(r <= F.col("__q__"), r))).alias("es"),
    )
