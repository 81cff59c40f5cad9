"""Loop-free portfolio backtesting (reference §3.2 re-expressed).

Reference: finds/backtesting/backtesting.py (univariate_sorts: a python
loop over rebalance dates, each issuing several SQL queries) and
backtest.py (BackTest.__call__: a second loop over holding periods).

Spark re-expression (SURVEY §3.2): holdings for ALL rebalance dates are
one DataFrame ``(rebaldate, permno, weight)`` computed set-at-a-time with
windows partitioned by rebaldate; period portfolio returns are one
interval-compounded join.  Two shuffle-bounded jobs replace
~2 queries x N months.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_science_spark.operators import compound_intervals
from financial_data_science_spark.operators.fractiles import bucket_expr


def univariate_sorts(
    universe: DataFrame,
    signal: DataFrame,
    pcts: list[float] | None = None,
    key_filter=None,
    weight_col: str = "cap",
    sub: tuple[int, int] = (1, 10),
) -> DataFrame:
    """Signal-sorted portfolio holdings for every rebalance date at once.

    ``universe``: (rebaldate, permno, <weight_col>, is_key...) — the
    eligible cross-sections (one per rebalance date, §3.1).
    ``signal``: (rebaldate, permno, value) — prevailing signal values.

    Per rebaldate: breakpoints on the key sub-population (A6 semantics,
    backtesting.py:71-76), bucket all names, long top fractile / short
    bottom (``sub``), weights proportional to ``weight_col`` normalized
    within (rebaldate, side).  Entirely window-based: one shuffle on
    rebaldate.
    """
    pcts = pcts or [10.0 * i for i in range(1, 10)]
    probs = F.array(*[F.lit(p / 100.0) for p in pcts])
    j = universe.join(signal, ["rebaldate", "permno"], "inner")
    wd = Window.partitionBy("rebaldate")
    key_src = F.when(key_filter, F.col("value")) if key_filter is not None else F.col("value")
    breaks = F.percentile(key_src, probs).over(wd)
    j = j.withColumn("fractile", bucket_expr(F.col("value"), breaks))
    lo, hi = sub
    sided = j.filter(F.col("fractile").isin(lo, hi)).withColumn(
        "side", F.when(F.col("fractile") == hi, 1).otherwise(-1)
    )
    ws = Window.partitionBy("rebaldate", "side")
    return sided.withColumn(
        "weight",
        F.col("side") * F.col(weight_col) / F.sum(weight_col).over(ws),
    ).select("rebaldate", "permno", "fractile", "side", "weight")


def portfolio_returns(
    holdings: DataFrame,
    daily: DataFrame,
    intervals: DataFrame,
    ret_col: str = "ret",
) -> DataFrame:
    """BackTest.__call__ (backtest.py:101-181) set-at-a-time: compound
    constituent returns within each (beg, end] holding period (A4), join
    holdings on (rebaldate=beg, permno), weighted-sum per period."""
    per = compound_intervals(daily, intervals, "permno", ret_col=ret_col, alias="pret")
    j = holdings.join(
        per,
        (holdings.rebaldate == per.beg) & (holdings.permno == per.permno),
        "inner",
    )
    return (
        j.groupBy("beg", "end")
        .agg(
            F.sum(F.col("weight") * F.coalesce("pret", F.lit(0.0))).alias("ret"),
            F.count(F.lit(1)).alias("n_holdings"),
        )
        .orderBy("beg")
    )


def turnover(holdings: DataFrame) -> DataFrame:
    """A16: per-rebalance buys/sells from holding deltas
    (backtest.py:156-169) via a full-outer self-join of consecutive
    rebalances expressed as a lag window over (permno, rebal_seq)."""
    seq = holdings.select("rebaldate").distinct().withColumn(
        "__seq__", F.row_number().over(Window.orderBy("rebaldate"))
    )
    h = holdings.join(F.broadcast(seq), "rebaldate")
    w = Window.partitionBy("permno").orderBy("__seq__")
    d = h.withColumn("prev_w", F.lag("weight").over(w)).withColumn(
        "prev_seq", F.lag("__seq__").over(w)
    )
    delta = F.col("weight") - F.when(
        F.col("prev_seq") == F.col("__seq__") - 1, F.coalesce("prev_w", F.lit(0.0))
    ).otherwise(F.lit(0.0))
    return (
        d.groupBy("rebaldate")
        .agg(
            F.sum(F.when(delta > 0, delta)).alias("buys"),
            (-F.sum(F.when(delta < 0, delta))).alias("sells"),
            F.sum(F.when(F.col("weight") > 0, 1).otherwise(0)).alias("n_long"),
            F.sum(F.when(F.col("weight") < 0, 1).otherwise(0)).alias("n_short"),
        )
        .orderBy("rebaldate")
    )


def smooth_holdings(holdings: DataFrame, k: int) -> DataFrame:
    """W10 overlap smoothing (backtest.py:140-149): average of the last k
    rebalances' weights per permno via a bounded rows window."""
    seq = holdings.select("rebaldate").distinct().withColumn(
        "__seq__", F.row_number().over(Window.orderBy("rebaldate"))
    )
    h = holdings.join(F.broadcast(seq), "rebaldate")
    w = (
        Window.partitionBy("permno")
        .orderBy("__seq__")
        .rowsBetween(-(k - 1), 0)
    )
    return h.withColumn("weight", F.avg("weight").over(w)).drop("__seq__")
