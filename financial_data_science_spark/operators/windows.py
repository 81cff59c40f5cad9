"""Ordered-window operators: ffill, islands, running stats, change compression.

Reference semantics:
  - forward-fill (W7): readers/taq.py:461,485,556; readers/real_time.py:88-89.
  - gaps-and-islands / recession spans (A13): readers/alfred.py:244-259
    ``date_spans`` — boolean run-length grouping via shift+cumsum.
  - running cumsum / max drawdown (W4): backtesting/eventstudy.py:120-122,
    recipes/finance.py:286-307.
  - reverse cumulative product (W5): readers/real_time.py:71-80 (split
    back-adjustment).
  - change-only compression (W9): readers/taq.py:379.
  - per-group sequence / cumcount (W6): readers/real_time.py:337-338.

All are single-window (one shuffle on the partition keys, sort within
partition); none materialize intermediate frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _w(keys: list[str] | str | None, order: list[str] | str) -> WindowSpec:
    order = [order] if isinstance(order, str) else list(order)
    if keys:
        keys = [keys] if isinstance(keys, str) else list(keys)
        return Window.partitionBy(*keys).orderBy(*order)
    return Window.orderBy(*order)


def ffill(
    df: DataFrame,
    cols: list[str] | str,
    order: list[str] | str,
    keys: list[str] | str | None = None,
) -> DataFrame:
    """Forward-fill nulls in ``cols`` along ``order`` within ``keys`` (W7)."""
    cols = [cols] if isinstance(cols, str) else list(cols)
    w = _w(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.select(
        *[c for c in df.columns if c not in cols],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in cols],
    )


def running(
    df: DataFrame,
    exprs: dict[str, Column],
    order: list[str] | str,
    keys: list[str] | str | None = None,
) -> DataFrame:
    """Attach running aggregates (cumsum/cummax/...) along ``order`` (W4).

    ``exprs`` maps output name -> aggregate Column (e.g. ``F.sum('x')``);
    each is evaluated over rows unbounded-preceding..current.
    """
    w = _w(keys, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for name, expr in exprs.items():
        out = out.withColumn(name, expr.over(w))
    return out


def cumcount(
    df: DataFrame, keys: list[str] | str, order: list[str] | str, out: str = "seq"
) -> DataFrame:
    """0-based per-group sequence (W6, real_time.py:337-338)."""
    return df.withColumn(out, F.row_number().over(_w(keys, order)) - 1)


def islands(
    df: DataFrame,
    flag: Column | str,
    order: list[str] | str,
    keys: list[str] | str | None = None,
    island_col: str = "island",
) -> DataFrame:
    """Run-length island ids over a boolean flag (A13, alfred.py:244-259).

    island id increments whenever the flag changes along ``order``; filter
    on the flag afterwards and groupBy(island) for span min/max.
    """
    f = F.col(flag) if isinstance(flag, str) else flag
    w = _w(keys, order)
    changed = (
        F.when(F.lag(f).over(w).isNull() | (F.lag(f).over(w) != f), 1).otherwise(0)
    )
    run = F.sum(changed).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(island_col, run)


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str | int,
    keys: list[str] | str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Session ids: a new session starts when the gap to the previous event
    exceeds ``gap`` (seconds if the ts column is a timestamp, else same
    units as the column).  Batch analogue of ``F.session_window`` (§2.9).
    """
    w = _w(keys, ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    delta = F.col(ts_col).cast("double") - prev.cast("double")
    new_sess = F.when(prev.isNull() | (delta > F.lit(float(gap))), 1).otherwise(0)
    sid = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, sid)


def drop_unchanged(
    df: DataFrame,
    watch: list[str],
    order: list[str] | str,
    keys: list[str] | str | None = None,
) -> DataFrame:
    """Keep only rows where any watched column differs from the previous row
    (W9, taq.py:379).  First row per group always kept.
    """
    w = _w(keys, order)
    cur = F.struct(*[F.col(c) for c in watch])
    prev = F.lag(cur).over(w)
    return (
        df.withColumn("__prev__", prev)
        .filter(F.col("__prev__").isNull() | (F.col("__prev__") != cur))
        .drop("__prev__")
    )


def reverse_cumprod(
    df: DataFrame,
    col: str,
    order: list[str] | str,
    keys: list[str] | str | None = None,
    out: str = "cumfactor",
) -> DataFrame:
    """Reversed cumulative product (W5, real_time.py:71-80): product of
    ``col`` over all *later* rows (exclusive), e.g. split back-adjustment
    factors.  Implemented as product over a descending-ordered window.
    """
    order = [order] if isinstance(order, str) else list(order)
    keys_l = [keys] if isinstance(keys, str) else list(keys or [])
    w = (
        Window.partitionBy(*keys_l).orderBy(*[F.col(c).desc() for c in order])
        if keys_l
        else Window.orderBy(*[F.col(c).desc() for c in order])
    ).rowsBetween(Window.unboundedPreceding, -1)
    prod = F.coalesce(F.product(F.col(col)).over(w), F.lit(1.0))
    return df.withColumn(out, prod)


def ewma(
    df: DataFrame,
    keys: list[str] | str | None,
    order: list[str] | str,
    col: str,
    alpha: float,
    adjust: bool = True,
    out: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per group, pandas `ewm`
    semantics (the reference pairs finance.halflife with pandas ewm in
    its RiskMetrics workflows).

    Expressed as pure window cumsums — NO per-group pandas UDF.  With
    lam = 1-alpha and i the 0-based row index:
      adjust=True:  y_t = cumsum(x_i lam^-i) / cumsum(lam^-i)
      adjust=False: y_t = lam^t * cumsum(i=0 ? x_0 : alpha x_i lam^-i)
    One shuffle on the group key; stays in whole-stage codegen.

    Numerical bound: lam^-i overflows double past i ~ 709/-ln(lam)
    (e.g. ~11,500 rows at alpha=0.06, ~7,000 at 0.10).  That covers
    decades of daily data per entity; for longer series split into
    blocks below the bound and carry y across blocks with the
    adjust=False recursion (one tiny per-block frame) — the in-block
    math is this same operator.
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys or [])
    order_l = [order] if isinstance(order, str) else list(order)
    lam = 1.0 - alpha
    wo = (
        Window.partitionBy(*keys_l).orderBy(*order_l)
        if keys_l
        else Window.orderBy(*order_l)
    )
    wc = wo.rowsBetween(Window.unboundedPreceding, 0)
    i = F.row_number().over(wo) - 1
    x = F.col(col).cast("double")
    d = df.withColumn("__i__", i)
    lam_neg_i = F.pow(F.lit(lam), -F.col("__i__"))
    if adjust:
        num = F.sum(
            F.when(x.isNotNull(), x * lam_neg_i)
        ).over(wc)
        den = F.sum(F.when(x.isNotNull(), lam_neg_i)).over(wc)
        y = num / den
    else:
        cs = F.sum(
            F.when(
                F.col("__i__") == 0, x
            ).otherwise(F.lit(alpha) * x * lam_neg_i)
        ).over(wc)
        y = F.pow(F.lit(lam), F.col("__i__")) * cs
    return d.withColumn(out, y).drop("__i__")


def max_drawdown_window(
    df: DataFrame,
    keys: list[str] | str | None,
    order: str,
    ret_col: str,
) -> DataFrame:
    """Maximum-drawdown window per group (reference finance.py:285-307
    maximum_drawdown): the (peak date, trough date) pair with levels and
    MDD = trough/peak - 1, from the log-compounded return path.

    Trough = argmax of (running max - running cumsum of log(1+r)), ties
    to the earliest date (pandas idxmax); peak = argmax of the cumsum at
    or before the trough.  Two ordered-window passes + one broadcast-able
    per-key join — no driver iteration.  Cumsums are rounded to 9dp
    before the argmax comparisons so cross-engine log/sum ulp noise can't
    flip a tie.
    """
    keys_l = [keys] if isinstance(keys, str) else list(keys or [])
    wo = (
        Window.partitionBy(*keys_l).orderBy(order)
        if keys_l
        else Window.orderBy(order)
    ).rowsBetween(Window.unboundedPreceding, 0)
    d = df.withColumn("__cum__", F.round(F.sum(F.log1p(ret_col)).over(wo), 9))
    d = d.withColumn("__peakcum__", F.max("__cum__").over(wo))
    d = d.withColumn("__dd__", F.round(F.col("__peakcum__") - F.col("__cum__"), 9))
    gb = d.groupBy(*keys_l) if keys_l else d.groupBy()
    end = gb.agg(
        F.min_by(
            F.struct(F.col(order).alias("end_date"),
                     F.col("__cum__").alias("end_cum")),
            F.struct(-F.col("__dd__"), F.col(order)),
        ).alias("__e__")
    ).select(*keys_l, "__e__.end_date", "__e__.end_cum")
    j = d.join(F.broadcast(end), keys_l) if keys_l else d.crossJoin(F.broadcast(end))
    pre = j.filter(F.col(order) <= F.col("end_date"))
    gb2 = pre.groupBy(*keys_l) if keys_l else pre.groupBy()
    out = gb2.agg(
        F.min_by(
            F.struct(F.col(order).alias("beg_date"),
                     F.col("__cum__").alias("beg_cum")),
            F.struct(-F.col("__cum__"), F.col(order)),
        ).alias("__b__"),
        F.first("end_date").alias("end_date"),
        F.first("end_cum").alias("end_cum"),
    )
    return out.select(
        *keys_l,
        F.col("__b__.beg_date").alias("peak_date"),
        F.col("end_date").alias("trough_date"),
        F.exp("__b__.beg_cum").alias("peak_level"),
        F.exp("end_cum").alias("trough_level"),
        (F.exp(F.col("end_cum") - F.col("__b__.beg_cum")) - 1).alias("mdd"),
    )
