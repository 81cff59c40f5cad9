"""Breakpoint bucketing on sub-population quantiles (reference A6/A7).

Reference semantics:
  - ``fractile_split`` recipes/filters.py:267-287: percentile breakpoints are
    computed on a *key subset* (NYSE-listed names), then **all** rows are
    bucketed against those breakpoints with ``searchsorted``.  This is NOT
    ``ntile`` — ntile equalizes counts over the whole population, which is
    exactly the bug the reference avoids (crsp.py:249-252,
    backtesting/backtesting.py:71-76).
  - winsorize / clip at [2.5%, 97.5%] recipes/filters.py:145-157.

Spark realization: exact ``percentile`` (interpolated, matches
numpy.percentile 'linear') on the filtered subset -> tiny breakpoints frame
-> broadcast cross join (1 row) -> bucket = number of breakpoints strictly
below the value.  Two jobs, both shuffle-light; the breakpoint frame is a
scalar row regardless of fact-table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def breakpoints(
    df: DataFrame, col: str, pcts: list[float], where: Column | None = None
) -> DataFrame:
    """One-row frame with an array<double> of interpolated percentiles."""
    src = df.filter(where) if where is not None else df
    probs = F.array(*[F.lit(p) for p in pcts])
    return src.select(
        F.percentile(F.col(col).cast("double"), probs).alias("__breaks__")
    )


def bucket_expr(col: str | Column, breaks: Column, ascending: bool = True) -> Column:
    """Bucket number 1..len(breaks)+1 by strict searchsorted (filters.py:281-287)."""
    c = F.col(col) if isinstance(col, str) else col
    n_below = F.aggregate(
        breaks,
        F.lit(0),
        lambda acc, b: acc + F.when(c > b, 1).otherwise(0),
    )
    if ascending:
        return n_below + 1
    return F.size(breaks) + 1 - n_below


def fractile_split(
    df: DataFrame,
    col: str,
    pcts: list[float] | None = None,
    key_filter: Column | None = None,
    out: str = "fractile",
    ascending: bool = True,
) -> DataFrame:
    """Assign fractile 1..N+1 to every row using subset breakpoints (A6).

    ``pcts`` are cumulative percent breakpoints (e.g. [10,20,...,90] for
    deciles); ``key_filter`` restricts the population the breakpoints are
    estimated on (reference: NYSE names only).  Broadcast of the one-row
    breakpoints frame keeps this a map-side operation over the fact table.
    """
    pcts = pcts or [10 * i for i in range(1, 10)]
    probs = [p / 100.0 for p in pcts]
    bp = breakpoints(df, col, probs, key_filter)
    return df.join(F.broadcast(bp)).withColumn(
        out, bucket_expr(col, F.col("__breaks__"), ascending)
    ).drop("__breaks__")


def winsorize(
    df: DataFrame,
    cols: list[str] | str,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """Clip columns to their [lo, hi] interpolated quantiles (filters.py:145-157)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    qs = df.select(
        *[
            F.percentile(F.col(c).cast("double"), F.array(F.lit(lo), F.lit(hi))).alias(
                f"__q_{c}__"
            )
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
