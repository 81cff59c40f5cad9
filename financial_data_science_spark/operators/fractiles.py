"""Breakpoint bucketing on sub-population quantiles (reference A6/A7).

Reference semantics:
  - ``fractile_split`` recipes/filters.py:267-287: percentile breakpoints are
    computed on a *key subset* (NYSE-listed names), then **all** rows are
    bucketed against those breakpoints with ``searchsorted``.  This is NOT
    ``ntile`` — ntile equalizes counts over the whole population, which is
    exactly the bug the reference avoids (crsp.py:249-252,
    backtesting/backtesting.py:71-76).
  - winsorize / clip at [2.5%, 97.5%] recipes/filters.py:145-157.

Spark realization: quantiles on the filtered subset -> tiny breakpoints
frame -> broadcast cross join (1 row) -> bucket = number of breakpoints
strictly below the value.  Two jobs, both shuffle-light; the breakpoint
frame is a scalar row regardless of fact-table size.

Scale note (A6/A7): the default estimator is ``percentile_approx``
(Greenwald-Khanna sketch, mergeable map-side, O(accuracy) memory per
aggregation buffer regardless of population size — accuracy=10000 bounds
rank error at N/10000).  Exact interpolated ``percentile`` buffers every
value of the (sub)population in ONE aggregation buffer, which is a
single-task memory bomb at 100 TB; it remains available behind
``exact=True`` for small populations and for oracle parity against
DuckDB's interpolated ``quantile_cont``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rank-error bound for the sketch: eps = 1/ACCURACY of the population.
APPROX_ACCURACY = 10000


def quantiles_expr(
    c: Column, probs: Column, exact: bool = False, accuracy: int = APPROX_ACCURACY
) -> Column:
    """Aggregate expression for an array of quantiles of ``c``.

    ``exact=False`` (default): Greenwald-Khanna sketch, bounded memory,
    returns actual data values.  ``exact=True``: interpolated percentile
    (numpy 'linear'), unbounded buffer — test/oracle scale only.
    """
    if exact:
        return F.percentile(c, probs)
    return F.percentile_approx(c, probs, F.lit(accuracy))


def breakpoints(
    df: DataFrame,
    col: str,
    pcts: list[float],
    where: Column | None = None,
    exact: bool = False,
    accuracy: int = APPROX_ACCURACY,
) -> DataFrame:
    """One-row frame with an array<double> of quantile breakpoints."""
    src = df.filter(where) if where is not None else df
    probs = F.array(*[F.lit(p) for p in pcts])
    return src.select(
        quantiles_expr(F.col(col).cast("double"), probs, exact, accuracy).alias(
            "__breaks__"
        )
    )


def bucket_expr(col: str | Column, breaks: Column, ascending: bool = True) -> Column:
    """Bucket number 1..len(breaks)+1 by strict searchsorted
    (filters.py:281-287).  Null values get a null bucket — the reference
    dropna()s signals before sorting, so a null must never land in an
    investable fractile."""
    c = F.col(col) if isinstance(col, str) else col
    n_below = F.aggregate(
        breaks,
        F.lit(0),
        lambda acc, b: acc + F.when(c > b, 1).otherwise(0),
    )
    bucket = n_below + 1 if ascending else F.size(breaks) + 1 - n_below
    return F.when(c.isNotNull(), bucket)


def fractile_split(
    df: DataFrame,
    col: str,
    pcts: list[float] | None = None,
    key_filter: Column | None = None,
    out: str = "fractile",
    ascending: bool = True,
    exact: bool = False,
) -> DataFrame:
    """Assign fractile 1..N+1 to every row using subset breakpoints (A6).

    ``pcts`` are cumulative percent breakpoints (e.g. [10,20,...,90] for
    deciles); ``key_filter`` restricts the population the breakpoints are
    estimated on (reference: NYSE names only).  Broadcast of the one-row
    breakpoints frame keeps this a map-side operation over the fact table.
    Null values of ``col`` get a null fractile.
    """
    pcts = pcts or [10 * i for i in range(1, 10)]
    probs = [p / 100.0 for p in pcts]
    bp = breakpoints(df, col, probs, key_filter, exact=exact)
    return df.join(F.broadcast(bp)).withColumn(
        out, bucket_expr(col, F.col("__breaks__"), ascending)
    ).drop("__breaks__")


def winsorize(
    df: DataFrame,
    cols: list[str] | str,
    lo: float = 0.025,
    hi: float = 0.975,
    exact: bool = False,
) -> DataFrame:
    """Clip columns to their [lo, hi] quantiles (filters.py:145-157)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    qs = df.select(
        *[
            quantiles_expr(
                F.col(c).cast("double"), F.array(F.lit(lo), F.lit(hi)), exact
            ).alias(f"__q_{c}__")
            for c in cols
        ]
    )
    out = df.join(F.broadcast(qs))
    for c in cols:
        q = F.col(f"__q_{c}__")
        # guard nulls: greatest/least IGNORE nulls, which would silently
        # turn a null into the clip bound
        clipped = F.least(F.greatest(F.col(c), q[0]), q[1])
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), clipped))
    return out.drop(*[f"__q_{c}__" for c in cols])


def outlier_fences(
    df: DataFrame,
    cols: list[str] | str,
    method: str = "iq10",
    keys: list[str] | str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-column outlier fences (reference recipes/filters.py:161-206
    is_outlier(fences=True)): 'iq{D}' = median +/- D*(Q3-Q1); 'tukey' =
    [Q1 - 1.5 IQR, Q3 + 1.5 IQR]; 'farout' = tukey with 3 IQR.  Returns
    one row (per group if ``keys``) with <col>_lo / <col>_hi bounds —
    quartiles in one aggregate, same sketch-vs-exact tradeoff as
    breakpoints()."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    if method.lower().startswith(("tukey", "far")):
        w = 1.5 if method[0].lower() == "t" else 3.0
        mode = "tukey"
    elif method.lower().startswith("iq"):
        w = float(method[2:])
        mode = "iq"
    else:
        raise ValueError("method not in {'iq{D}', 'tukey', 'farout'}")
    aggs = []
    for c in cols:
        q = quantiles_expr(
            F.col(c).cast("double"),
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            exact,
        )
        aggs.append(q.alias(f"__q_{c}__"))
    keys = [keys] if isinstance(keys, str) else list(keys or [])
    qdf = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    out_cols = list(keys)
    for c in cols:
        q = F.col(f"__q_{c}__")
        iqr = q[2] - q[0]
        center_lo = q[1] if mode == "iq" else q[0]
        center_hi = q[1] if mode == "iq" else q[2]
        out_cols.append((center_lo - w * iqr).alias(f"{c}_lo"))
        out_cols.append((center_hi + w * iqr).alias(f"{c}_hi"))
    return qdf.select(*out_cols)


def remove_outliers(
    df: DataFrame,
    cols: list[str] | str,
    method: str = "iq10",
    keys: list[str] | str | None = None,
    exact: bool = True,
) -> DataFrame:
    """Null out column-wise outliers (reference filters.py:230-259
    remove_outliers): values outside the ``method`` fences become null.
    Fences are a one-row (or per-group) frame broadcast back — same
    broadcast-join shape as winsorize, one extra aggregate job."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    keys = [keys] if isinstance(keys, str) else list(keys or [])
    fences = outlier_fences(df, cols, method, keys or None, exact)
    out = df.join(F.broadcast(fences), keys) if keys else df.join(F.broadcast(fences))
    for c in cols:
        lo, hi = F.col(f"{c}_lo"), F.col(f"{c}_hi")
        out = out.withColumn(
            c, F.when(F.col(c).between(lo, hi), F.col(c))
        )
    return out.drop(*[f"{c}_lo" for c in cols], *[f"{c}_hi" for c in cols])
