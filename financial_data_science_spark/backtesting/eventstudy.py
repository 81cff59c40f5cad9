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


def corrected_stats(
    cb: DataFrame,
    calendar: TradingCalendar,
    left: int,
    right: int,
    post: int,
    event_keys: list[str],
    event_date: str = "announcedate",
    value: str = "car",
    rho: float | None = None,
) -> DataFrame:
    """Kolari-Pape-Pynnönen (2018) eqn 15 corrected event-study inference
    (reference eventstudy.py:180-280 `fit`).

    Event-day clustering and cross-event correlation overstate the
    effective sample: the corrected stderr divides by
    ``sqrt(M / (1 + rho*tau*(M-1)))`` where ``tau`` is the average
    pairwise overlap of post-announcement windows (truncated at 0,
    normalized by the post length D = post - right) and ``rho`` is the
    average cross-event return correlation.

    ``cb``: per-event long frame over rel in [left, post] with a running
    ``value`` column (from car_bhar).  Announce dates are offset to the
    prevailing trading day and same-date events portfolio-averaged first
    (eventstudy.py:224-229).  ``rho=None`` estimates it as the mean
    best-alignment FFT cross-correlation of the per-date post-window
    log-return series (filters.py:67-97) — that step collects a
    (D x n_dates) matrix, driver-scale by construction.

    Returns ONE row: window/post means, corrected t-stats, rho, tau,
    effective N, date and event counts.  All aggregation stays in Spark;
    only the optional rho estimate leaves the cluster.
    """
    from financial_data_science_spark.operators import asof_join

    window = right - left + 1  # noqa: F841 — documents the reference shape
    D = post - right
    # announce date -> prevailing trading day (reference bd.offset)
    ad = cb.select(F.col(event_date).alias("__ad__")).distinct()
    dim = calendar.dim.select(
        F.col("date").alias("__cd__"), F.col("date").alias("__adate__"), "day_num"
    )
    adj = asof_join(ad, dim, by=[], left_on="__ad__", right_on="__cd__")
    cbp = cb.join(
        F.broadcast(adj.select("__ad__", "__adate__")),
        cb[event_date] == F.col("__ad__"),
    ).drop("__ad__")
    port = cbp.groupBy("__adate__", "rel").agg(F.avg(value).alias("v"))

    if rho is None:
        # post-window log diffs per date portfolio: log(1+clip(v,-0.99)),
        # diff along rel, rel in (right, post] (eventstudy.py:246-253)
        import numpy as np

        from financial_data_science_spark.functions.econs import fft_align_max

        wrel = Window.partitionBy("__adate__").orderBy("rel")
        lg = F.log(1 + F.greatest(F.col("v"), F.lit(-0.99)))
        diffs = (
            port.withColumn("__d__", lg - F.lag(lg).over(wrel))
            .filter((F.col("rel") > right) & (F.col("rel") <= post))
            .toPandas()
            .pivot(index="rel", columns="__adate__", values="__d__")
            .fillna(0.0)
        )
        rho = float(np.nanmean(fft_align_max(diffs.to_numpy())))

    win = port.filter(F.col("rel") == right).agg(
        F.avg("v").alias("__mw__"),
        F.stddev_samp("v").alias("__sw__"),
        F.count(F.lit(1)).alias("n_dates"),
    )
    seg = (
        port.filter(F.col("rel").isin(right, post))
        .groupBy("__adate__")
        .agg(
            F.max(F.when(F.col("rel") == right, F.col("v"))).alias("__vr__"),
            F.max(F.when(F.col("rel") == post, F.col("v"))).alias("__vp__"),
        )
        .agg(
            F.avg(F.col("__vp__") - F.col("__vr__")).alias("__mp__"),
            F.stddev_samp(F.col("__vp__") - F.col("__vr__")).alias("__sp__"),
        )
    )
    # average pairwise overlap of post windows, in trading days.  The
    # pairwise definition avg_{i<j} max(D - (d_j - d_i), 0) / D is
    # computed WITHOUT the O(n^2) theta self-join (which plans as a
    # CartesianProduct): only predecessors within D-1 days of d_j
    # contribute, and their sum telescopes to cnt*(D - d_j) + sum(d_i)
    # over a rangeBetween(-(D-1), -1) window on the sorted day numbers —
    # O(n log n), FP-identical (integer contributions, same division
    # order as avg/D).  The single-partition window is fine: didx is the
    # aggregated distinct-announce-date frame, driver-scale by
    # construction (SURVEY §3.3).
    didx = adj.join(
        port.select(F.col("__adate__").alias("__a2__")).distinct(),
        adj["__adate__"] == F.col("__a2__"),
    ).select("day_num").distinct()
    wtau = Window.orderBy("day_num").rangeBetween(-(D - 1), -1)
    contrib = didx.select(
        F.col("day_num"),
        (
            F.count(F.lit(1)).over(wtau) * (F.lit(D) - F.col("day_num"))
            + F.coalesce(F.sum("day_num").over(wtau), F.lit(0))
        ).alias("__c__"),
    )
    npairs = (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2.0)
    tau = contrib.agg(
        # <2 distinct announce dates => npairs = 0; yield NULL (matching
        # the old pairwise self-join's empty avg) rather than 0.0/0.0 NaN
        F.when(
            npairs > 0,
            (F.sum("__c__").cast("double") / npairs) / F.lit(float(D)),
        ).alias("tau")
    )
    nev = cb.select(*event_keys).distinct().agg(
        F.count(F.lit(1)).alias("n_events")
    )
    md = F.col("n_dates").cast("double")
    eff = md / (1 + F.lit(rho) * F.col("tau") * (md - 1))
    return (
        # broadcast the 1-row sides so the combine plans as a broadcast
        # nested-loop over single rows, not a CartesianProduct node
        win.crossJoin(F.broadcast(seg))
        .crossJoin(F.broadcast(tau))
        .crossJoin(F.broadcast(nev))
        .select(
            F.col("__mw__").alias("window_mean"),
            F.try_divide(
                F.col("__mw__"), F.col("__sw__") / F.sqrt(eff)
            ).alias("window_t"),
            F.col("__mp__").alias("post_mean"),
            F.try_divide(
                F.col("__mp__"), F.col("__sp__") / F.sqrt(eff)
            ).alias("post_t"),
            F.lit(rho).alias("rho"),
            F.col("tau"),
            eff.alias("effective"),
            F.col("n_dates"),
            F.col("n_events"),
        )
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
