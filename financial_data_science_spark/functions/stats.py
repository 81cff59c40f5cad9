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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_mean(x: str | Column, w: str | Column, alias: str = "wmean") -> Column:
    """NaN-aware weighted mean: weights of null-x rows excluded (A5)."""
    xc = F.col(x) if isinstance(x, str) else x
    wc = F.col(w) if isinstance(w, str) else w
    return F.try_divide(
        F.sum(F.when(xc.isNotNull(), xc * wc)),
        F.sum(F.when(xc.isNotNull(), wc)),
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
        # constant group (sd == 0) z-scores to NULL, not an ANSI error
        out = out.withColumn(c, F.try_divide(F.col(c) - mu, sd))
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


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 erf approximation (|err| < 1.5e-7) as pure
    column arithmetic — Spark SQL has no erf builtin, and the identical
    polynomial is replayed in the DuckDB oracle so both engines agree to
    machine precision (scale-aware: the driver never evaluates it)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return 1.0 - poly * F.exp(-x * x)


def kupiec_stats(
    df: DataFrame,
    keys: list[str] | str,
    ret: str = "ret",
    var_col: str | None = None,
    alpha: float = 0.05,
) -> DataFrame:
    """Kupiec proportion-of-failures LR test per group
    (finance.py:360-389): s violations (ret < -VaR) in n trials,
    LR = -2[(n-s)ln(1-p) + s ln p - (n-s)ln(1-s/n) - s ln(s/n)],
    pvalue from chi2(df=1): 1 - erf(sqrt(LR/2)).

    ``var_col=None`` backtests the in-sample historical VaR (the
    group's own alpha quantile), matching historical_risk; pass a
    predicted-VaR column for out-of-sample backtests.  One shuffle: the
    quantile rides a partition window, violations and n are one
    aggregate.  The s=0 / s=n edges use the 0*ln(0)=0 limit.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    r = F.col(ret)
    if var_col is None:
        # round the interpolated quantile to the 6dp grid BEFORE the
        # strict < comparison: with heavy value ties sitting exactly at
        # the alpha rank, a last-ulp interpolation difference between
        # engines otherwise flips every tied row in or out of the
        # violation count (surfaced at the sf1 sweep, 10x-replicated
        # values) — the repo-wide round-before-compare discipline
        q = F.round(
            F.percentile(r, F.lit(alpha)).over(Window.partitionBy(*keys)), 6
        )
        df = df.withColumn("__negvar__", q)
    else:
        df = df.withColumn("__negvar__", -F.col(var_col))
    agg = df.groupBy(*keys).agg(
        F.count(r).alias("n"),
        F.sum((r < F.col("__negvar__")).cast("long")).alias("violations"),
        # var_col branch: avg, not first — first() over an unordered group
        # is nondeterministic across partitionings for time-varying VaR
        (-F.first("__negvar__")).alias("var") if var_col is None
        else F.avg(var_col).alias("var"),
    )
    p = alpha
    n, s = F.col("n").cast("double"), F.col("violations").cast("double")
    num = (n - s) * F.lit(math.log(1 - p)) + s * F.lit(math.log(p))
    den = F.when(s > 0, s * F.log(s / n)).otherwise(0.0) + F.when(
        s < n, (n - s) * F.log(1 - s / n)
    ).otherwise(0.0)
    # mathematically lr >= 0, but it can round to a tiny negative when
    # s/n is very close to p, which would NaN the sqrt below (and diverge
    # from the oracle); clamp at 0 in both engines
    lr = F.greatest(-2.0 * (num - den), F.lit(0.0))
    return agg.select(
        *keys, "n", "violations", "var",
        lr.alias("lr"),
        (1.0 - _erf_approx(F.sqrt(lr / 2.0))).alias("pvalue"),
    )


def bootstrap_risk(
    df: DataFrame,
    keys: list[str] | str,
    ret: str = "ret",
    alpha: float = 0.05,
    n_samples: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Bootstrap distribution of the historical risk measures
    (finance.py:339-358): ``n_samples`` with-replacement resamples, each a
    ``df.sample(withReplacement=True)`` tagged with a sample id, then the
    same VaR/ES/moments aggregation per (group, sample).

    Plan shape: the union replays the scan n_samples times — cache the
    input (or persist to a cheap columnar cache) when the source is an
    expensive lineage; each resample is embarrassingly parallel and
    nothing ever gathers to the driver.  Returns the per-sample risk
    frame; aggregate downstream for CIs (e.g. stddev of var across
    sample_id = bootstrap stderr).

    DEVIATION from the reference (finance.py:339-358): Spark's
    ``sample(withReplacement=True, fraction=1.0)`` is a *Poisson*
    bootstrap — each row is drawn Poisson(1) times, so resample sizes
    vary around n rather than equaling it exactly.  This is the standard
    distributed bootstrap (an exact fixed-n multinomial draw would need a
    global count + per-partition coordination); for the n at which
    bootstrapping is meaningful the extra dispersion is O(1/sqrt(n)) of
    the statistic's own stderr.  Users comparing CI widths to the
    reference's fixed-n resamples should expect slightly wider tails.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    samples = [
        df.sample(withReplacement=True, fraction=1.0, seed=seed + b)
        .withColumn("__sample__", F.lit(b))
        for b in range(n_samples)
    ]
    allb = samples[0]
    for s in samples[1:]:
        allb = allb.unionByName(s)
    return risk_summary(allb, keys + ["__sample__"], ret=ret, alpha=alpha)\
        .withColumnRenamed("__sample__", "sample_id")


def norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — no scipy in this image).  Evaluated driver-side
    to a float literal so Spark and the DuckDB oracle consume the exact
    same constant."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0, 1)")
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def parametric_risk(
    df: DataFrame, keys: list[str] | str, ret: str = "ret", alpha: float = 0.05
) -> DataFrame:
    """Parametric (gaussian) VaR/ES per group from the sample volatility
    (reference finance.py:309-318 parametric_risk): VaR = -sigma * z_alpha,
    ES = sigma * pdf(z_alpha) / alpha.  z_alpha = norm_ppf(alpha) is a
    driver-side literal; everything else is one hash aggregate.  (The
    reference parameterizes by 1-alpha; alpha here is the tail mass,
    matching risk_summary.)"""
    keys = [keys] if isinstance(keys, str) else list(keys)
    z = norm_ppf(alpha)
    pdf_z = math.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
    sigma = F.stddev_samp(F.col(ret))
    return df.groupBy(*keys).agg(
        F.count(F.col(ret)).alias("n"),
        sigma.alias("sigma"),
        (-sigma * F.lit(z)).alias("var"),
        (sigma * F.lit(pdf_z / alpha)).alias("es"),
    )


def fstats_breaks(
    df: DataFrame,
    keys: list[str] | str,
    value: str = "value",
    order: str = "date",
    tail: float = 0.15,
) -> DataFrame:
    """Chow-type F statistics at every candidate break point per group
    (reference econs.py:267-283 fstats): for split i,
    sse_i = (var(x[:i])*i + var(x[i:])*(n-i))/n (ddof=0) and
    F_i = ((n-2)/2) * (rse - sse_i)/rse; points in the first/last
    ``tail`` fraction get F = 0 (the reference leaves sse = rse there).

    Set-at-a-time: prefix variances come from cumulative sums of x and
    x^2 over an ordered window, suffix variances from the group totals
    minus the prefix — one shuffle on the group key, no per-split scan
    (the reference recomputes np.var per candidate, O(n^2)).

    Scale note: each group's ordered series rides one window partition,
    the standard Spark time-series tradeoff (same class as the tcode /
    cumulative operators); break testing is per-series by definition, so
    pre-aggregate to the analysis frequency (as the catalog query does
    daily) before calling.
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    x = F.col(value).cast("double")
    wo = Window.partitionBy(*keys).orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wg = Window.partitionBy(*keys)
    d = (
        df.select(*keys, order, x.alias("__x__"))
        .withColumn("__i__", F.count(F.lit(1)).over(
            Window.partitionBy(*keys).orderBy(order).rowsBetween(
                Window.unboundedPreceding, -1)))
        .withColumn("__cs__", F.coalesce(F.sum("__x__").over(wo), F.lit(0.0)))
        .withColumn("__cs2__", F.coalesce(F.sum(F.col("__x__") * F.col("__x__")).over(wo), F.lit(0.0)))
        .withColumn("__n__", F.count(F.lit(1)).over(wg))
        .withColumn("__s__", F.sum("__x__").over(wg))
        .withColumn("__s2__", F.sum(F.col("__x__") * F.col("__x__")).over(wg))
    )
    i = F.col("__i__").cast("double")
    n = F.col("__n__").cast("double")
    rse = F.col("__s2__") / n - F.pow(F.col("__s__") / n, 2)
    var_pre = F.col("__cs2__") / i - F.pow(F.col("__cs__") / i, 2)
    cs_suf = F.col("__s__") - F.col("__cs__")
    cs2_suf = F.col("__s2__") - F.col("__cs2__")
    var_suf = cs2_suf / (n - i) - F.pow(cs_suf / (n - i), 2)
    sse = (var_pre * i + var_suf * (n - i)) / n
    in_window = (i >= F.floor(n * tail)) & (i <= F.floor((1.0 - tail) * n))
    fstat = F.when(in_window, ((n - 2) / 2.0) * (rse - sse) / rse).otherwise(0.0)
    return d.select(*keys, order, F.col("__x__").alias(value),
                    fstat.alias("fstat"))


def rolling_ols(
    df: DataFrame,
    keys: list[str] | str | None,
    order: str,
    y: str,
    x: str,
    window: int,
) -> DataFrame:
    """Trailing-window simple OLS per row (rolling beta/alpha — the
    rolling form of group_ols, reference econs.py:238-265 least_squares):
    slope/intercept/r2 over the last ``window`` observations, from the
    same normal-equation sums evaluated over a rowsBetween frame.

    One shuffle on the group key; every statistic is a windowed sum —
    no per-row refit, no UDF.  Rows with fewer than ``window`` prior
    observations get nulls (pandas rolling min_periods=window).
    """
    from pyspark.sql import Window

    from financial_data_science_spark.operators.windows import (
        _guard,
        tiny_ordered_window,
    )

    keys_l = [keys] if isinstance(keys, str) else list(keys or [])
    w = (
        Window.partitionBy(*keys_l).orderBy(order)
        if keys_l
        else tiny_ordered_window(order)
    ).rowsBetween(-(window - 1), 0)
    yc, xc = F.col(y).cast("double"), F.col(x).cast("double")
    both = yc.isNotNull() & xc.isNotNull()
    yv, xv = F.when(both, yc), F.when(both, xc)
    n = F.count(xv).over(w).cast("double")
    sx, sy = F.sum(xv).over(w), F.sum(yv).over(w)
    sxx = F.sum(xv * xv).over(w)
    syy = F.sum(yv * yv).over(w)
    sxy = F.sum(xv * yv).over(w)
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    r_denom = (n * sxx - sx * sx) * (n * syy - sy * sy)
    r2 = F.when(r_denom > 0, F.pow(n * sxy - sx * sy, 2) / r_denom)
    full = n >= float(window)
    if not keys_l:
        slope = _guard(slope, [order])
    return df.select(
        *keys_l, order, y, x,
        F.when(full, slope).alias("slope"),
        F.when(full, intercept).alias("intercept"),
        F.when(full, r2).alias("r2"),
    )
