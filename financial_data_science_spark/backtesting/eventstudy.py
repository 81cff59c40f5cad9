"""Event-study CAR/BHAR pipeline (reference §3.3 re-expressed).

Reference: finds/backtesting/eventstudy.py — per-event windows gathered by
a per-relative-day SQL loop (stocks.py:262-291), then pandas cumsum and
portfolio-method averaging.

Spark re-expression: events ⋈ calendar -> explode relative days -> ONE
equi-join against daily returns (J4) -> abnormal return = ret - market ->
running windows per event for CAR/BHAR (W4) -> same-announce-date
portfolio averaging (A10) -> cross-sectional stats.  One lineage, three
shuffles (event join, event window, date grouping), regardless of the
window length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_science_spark.operators import event_window
from financial_data_science_spark.plans.calendar import TradingCalendar


def abnormal_returns(
    events: DataFrame,
    daily: DataFrame,
    market: DataFrame,
    calendar: TradingCalendar,
    left: int = -1,
    right: int = 10,
    event_date: str = "announcedate",
    ret_col: str = "ret",
) -> DataFrame:
    """Long frame (event cols, rel, ar): AR = ret - mkt per relative day.

    ``events``: (permno, announcedate[, event_id...]); ``market``:
    (date, mktret).  Missing daily returns contribute 0 (reference fills
    via reindex, eventstudy.py:110-118).
    """
    fact = daily.select("permno", F.col("date").alias("__fd__"), ret_col)
    gathered = event_window(
        events, fact, by="permno", event_date=event_date, fact_date="__fd__",
        values=[ret_col], left=left, right=right, calendar=calendar.dim,
    )
    mkt = F.broadcast(market.select(F.col("date").alias("__reldate__"),
                                    F.col("mktret")))
    # re-derive the actual relative date to join the market series
    ev_cal = F.broadcast(calendar.dim.select("date", "day_num"))
    g = (
        gathered.join(ev_cal, gathered[event_date] == ev_cal["date"], "left")
        .drop(ev_cal["date"])
        .withColumn("__num__", F.col("day_num") + F.col("rel"))
        .drop("day_num")
    )
    cal2 = F.broadcast(
        calendar.dim.select(F.col("date").alias("__reldate__"),
                            F.col("day_num").alias("__num__"))
    )
    g = g.join(cal2, "__num__", "left").drop("__num__")
    g = g.join(mkt, "__reldate__", "left").drop("__reldate__")
    return g.withColumn(
        "ar",
        F.coalesce(ret_col, F.lit(0.0)) - F.coalesce("mktret", F.lit(0.0)),
    ).drop(ret_col, "mktret")


def car_bhar(ab: DataFrame, event_keys: list[str]) -> DataFrame:
    """W4 running windows per event: CAR = cumsum(ar), BHAR = cumprod(1+ar)-1
    (eventstudy.py:119-124)."""
    w = (
        Window.partitionBy(*event_keys)
        .orderBy("rel")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ab.withColumn("car", F.sum("ar").over(w)).withColumn(
        "bhar", F.product(1 + F.col("ar")).over(w) - 1
    )


def portfolio_stats(
    cb: DataFrame, event_date: str = "announcedate"
) -> DataFrame:
    """A10 portfolio method: average same-announce-date events first, then
    cross-sectional mean/std/count per relative day
    (eventstudy.py:228-262)."""
    by_date = cb.groupBy(event_date, "rel").agg(
        F.avg("car").alias("car"), F.avg("bhar").alias("bhar")
    )
    return (
        by_date.groupBy("rel")
        .agg(
            F.avg("car").alias("car_mean"),
            F.stddev_samp("car").alias("car_std"),
            F.avg("bhar").alias("bhar_mean"),
            F.stddev_samp("bhar").alias("bhar_std"),
            F.count(F.lit(1)).alias("n_dates"),
        )
        .orderBy("rel")
    )


def event_study(
    events: DataFrame,
    daily: DataFrame,
    market: DataFrame,
    calendar: TradingCalendar,
    left: int = -1,
    right: int = 10,
    event_date: str = "announcedate",
    event_keys: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline -> (per-event CAR/BHAR long frame, per-rel-day stats)."""
    keys = event_keys or ["permno", event_date]
    ab = abnormal_returns(
        events, daily, market, calendar, left, right, event_date
    )
    cb = car_bhar(ab, keys)
    return cb, portfolio_stats(cb, event_date)
