"""Event-window gather/aggregate joins (reference J4/J5, §3.3).

Reference semantics:
  - ``Stocks.get_window`` structured/stocks.py:202-294 (J4): for each input
    (entity, anchor_date) row, gather a value series over relative trading
    days [left, right] around the anchor — the reference loops one SQL join
    per relative day against a temp table.
  - AVG variant structured/stocks.py:227-259 (J5): range join
    ``fact.date BETWEEN anchor.a AND anchor.b`` + per-event AVG.

Spark realization:
  J4 -> explode a relative-offset sequence on the (small) events side, map
  each offset to an actual date via the calendar dimension, then ONE
  equi-join against the fact table on (entity, date) and an optional pivot
  to wide.  Fan-out = window length on the events side only; the 100 TB
  fact table is joined exactly once with an equi-key Catalyst can plan
  (broadcast events when small, else shuffle-hash on (entity, date)).

  J5 -> plain range join grouped per event.  Bound the fan-out by
  broadcasting the events side; at scale bucket both sides by coarse date
  so the theta join becomes equi-on-bucket + residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def event_window(
    events: DataFrame,
    fact: DataFrame,
    by: list[str] | str,
    event_date: str,
    fact_date: str,
    values: list[str],
    left: int,
    right: int,
    calendar: DataFrame | None = None,
    cal_date: str = "date",
    cal_num: str = "day_num",
    pivot: bool = False,
) -> DataFrame:
    """Gather ``values`` at relative offsets [left, right] around each event.

    With ``calendar`` (date -> consecutive trading-day number), offsets step
    trading days exactly like ``bd.offset`` (busday.py:202-280); without it,
    offsets are applied directly in the units of the date columns.

    Returns long format (event cols + ``rel`` + values) unless
    ``pivot=True`` (wide columns ``{val}_{rel}``) — long is preferable at
    scale (SURVEY §2.3 J4).
    """
    by = [by] if isinstance(by, str) else list(by)
    rel = F.explode(F.sequence(F.lit(left), F.lit(right))).alias("rel")
    ev = events.select("*", rel)
    if calendar is not None:
        cal = F.broadcast(calendar.select(cal_date, cal_num))
        ev = (
            ev.join(cal, ev[event_date] == cal[cal_date], "inner")
            .drop(cal_date)
            .withColumn("__num__", F.col(cal_num) + F.col("rel"))
            .drop(cal_num)
        )
        cal2 = F.broadcast(
            calendar.select(
                F.col(cal_date).alias("__reldate__"), F.col(cal_num).alias("__num__")
            )
        )
        ev = ev.join(cal2, "__num__", "inner").drop("__num__")
    else:
        ev = ev.withColumn("__reldate__", F.col(event_date) + F.col("rel"))
    j = ev.join(
        fact.select(*by, F.col(fact_date).alias("__reldate__"), *values),
        by + ["__reldate__"],
        "left",
    ).drop("__reldate__")
    if not pivot:
        return j
    agg = [F.first(v).alias(v) for v in values]
    wide = j.groupBy(*[c for c in events.columns]).pivot("rel").agg(*agg)
    return wide


def event_range_agg(
    events: DataFrame,
    fact: DataFrame,
    by: list[str] | str,
    beg_col: str,
    end_col: str,
    fact_date: str,
    aggs: list[Column],
    broadcast_events: bool = True,
) -> DataFrame:
    """Aggregate fact rows with ``beg <= fact_date <= end`` per event (J5)."""
    by = [by] if isinstance(by, str) else list(by)
    ev = F.broadcast(events) if broadcast_events else events
    cond = [fact[k] == events[k] for k in by] + [
        fact[fact_date].between(events[beg_col], events[end_col])
    ]
    j = ev.join(fact, cond, "inner")
    return j.groupBy(*[events[c] for c in events.columns]).agg(*aggs)
