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
    from pyspark.sql import Window

    by = [by] if isinstance(by, str) else list(by)
    if calendar is not None:
        # ONE calendar walk (r15): the old shape joined the calendar
        # twice — once keyed on the date (anchor -> day_num) and once on
        # the offset number (day_num + rel -> date) — and because the two
        # broadcasts hash different keys, ReusedExchange can never fire,
        # so the WHOLE calendar lineage (a full fact-table distinct-date
        # scan in every catalog caller) was computed twice per query.
        # Offsets are instead precomputed ON the calendar itself: per
        # calendar row, date at rank+r is lead(date, r) / lag(date, -r)
        # over the day_num order (one Window over the already
        # single-partition dimension), exploded to (date, rel, reldate)
        # and filtered non-null — exactly the rows the old inner join on
        # day_num+rel kept, since lead/lag null out beyond either end.
        # Events then join the tiny offset calendar ONCE.
        w = Window.orderBy(cal_num)
        shifted = calendar.select(
            F.col(cal_date),
            *[
                (
                    F.lag(F.col(cal_date), -r).over(w)
                    if r < 0
                    else F.lead(F.col(cal_date), r).over(w)
                ).alias(f"__rd_{i}__")
                for i, r in enumerate(range(left, right + 1))
            ],
        )
        offs = F.array(*[
            F.struct(
                F.lit(r).cast("int").alias("rel"),
                F.col(f"__rd_{i}__").alias("__reldate__"),
            )
            for i, r in enumerate(range(left, right + 1))
        ])
        cal_off = (
            shifted.select(F.col(cal_date), F.explode(offs).alias("__o__"))
            .select(
                cal_date,
                F.col("__o__.rel").alias("rel"),
                F.col("__o__.__reldate__").alias("__reldate__"),
            )
            .filter(F.col("__reldate__").isNotNull())
        )
        ev = events.join(
            F.broadcast(cal_off),
            events[event_date] == cal_off[cal_date],
            "inner",
        ).drop(cal_date)
    else:
        rel = F.explode(F.sequence(F.lit(left), F.lit(right))).alias("rel")
        ev = events.select("*", rel).withColumn(
            "__reldate__", F.col(event_date) + F.col("rel")
        )
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
