"""Daily realized performance of periodic holdings (reference
backtesting/dailyperformance.py:14-48).

The reference loops over every trading day, fetching that day's returns
and drifting the weights by (1+retx) — one SQL round trip per day.  The
set-at-a-time re-expression:

  weight of name i on day d  =  w_i(r) * prod_{s in (r, d)} (1 + retx_i(s))

where r is the prevailing rebalance on-or-before d.  So: as-of-attach the
rebalance date to each daily row (backward window, J1 pattern), take the
EXCLUSIVE running product of (1+retx) within (permno, rebalance) — the
drift factor — and aggregate w * drift * ret per day.  One shuffle for
the as-of, one window pass, one aggregation; no day loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_performance(
    holdings: DataFrame,
    daily: DataFrame,
    end: int | None = None,
) -> DataFrame:
    """Daily portfolio returns through ``end``.

    holdings: (rebaldate, permno, weight) — weights at each rebalance.
    daily: (permno, date, ret, retx) — daily total and ex-dividend returns.
    Returns (date, ret) for every date strictly after the first rebalance.

    Missing names on a day contribute 0 (the reference's reindex
    fill_value=0); a held name's missing retx drifts by 1 (fillna(0) on
    retx).
    """
    first_rebal = holdings.agg(F.min("rebaldate")).first()[0]
    d = daily.filter(F.col("date") > F.lit(first_rebal))
    if end is not None:
        d = d.filter(F.col("date") <= F.lit(end))

    rebals = holdings.select("rebaldate").distinct()
    # prevailing rebalance for each daily row: greatest rebaldate < date
    # (returns on the rebalance day itself accrue to the PREVIOUS holding,
    # matching the reference which updates holdings only after computing
    # that day's performance)
    tagged = d.join(
        F.broadcast(rebals), F.col("rebaldate") < F.col("date"), "inner"
    )
    w_pick = Window.partitionBy("permno", "date").orderBy(F.col("rebaldate").desc())
    tagged = (
        tagged.withColumn("__rn__", F.row_number().over(w_pick))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    # exclusive drift: product of (1+retx) over earlier days in the period
    w_drift = (
        Window.partitionBy("permno", "rebaldate")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    drifted = tagged.withColumn(
        "__drift__",
        F.coalesce(
            F.product(1.0 + F.coalesce(F.col("retx"), F.lit(0.0))).over(w_drift),
            F.lit(1.0),
        ),
    )
    j = drifted.join(holdings, ["rebaldate", "permno"], "inner")
    return (
        j.groupBy("date")
        .agg(
            F.sum(
                F.col("weight")
                * F.col("__drift__")
                * F.coalesce(F.col("ret"), F.lit(0.0))
            ).alias("ret")
        )
        .orderBy("date")
    )
