"""Trading calendar vs numpy busday oracle (busday.py semantics)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.plans.calendar import TradingCalendar


def _cal(spark, calendar_dates):
    return TradingCalendar.from_dates(
        spark.createDataFrame(pd.DataFrame({"date": calendar_dates}))
    )


def test_offset_roundtrip(spark, calendar_dates):
    cal = _cal(spark, calendar_dates)
    df = spark.createDataFrame(pd.DataFrame({"d": calendar_dates[50:150]}))
    fwd = cal.offset(df, "d", 7, out="d7")
    back = cal.offset(fwd, "d7", -7, out="d_back")
    p = back.toPandas()
    assert (p["d"] == p["d_back"]).all()


def test_offset_matches_list_shift(spark, calendar_dates):
    cal = _cal(spark, calendar_dates)
    df = spark.createDataFrame(pd.DataFrame({"d": calendar_dates[:-10]}))
    p = cal.offset(df, "d", 3, out="d3").toPandas().sort_values("d")
    idx = {d: i for i, d in enumerate(calendar_dates)}
    want = [calendar_dates[idx[d] + 3] for d in p["d"]]
    assert p["d3"].tolist() == want


def test_month_end_respects_holiday(spark, calendar_dates):
    """20231229 is a synthetic holiday -> December 2023 ends on the 28th."""
    cal = _cal(spark, calendar_dates)
    ends = {
        int(r["date"])
        for r in cal.period_ends("month").collect()
    }
    assert 20231228 in ends and 20231229 not in ends


def test_date_tuples_consecutive(spark, calendar_dates):
    cal = _cal(spark, calendar_dates)
    t = cal.date_tuples(20220101, 20221231, "month").toPandas()
    assert (t["beg"] < t["end"]).all()
    # ends chain: beg of row i+1 == end of row i
    assert t["beg"].iloc[1:].tolist() == t["end"].iloc[:-1].tolist()


def test_week_and_quarter_flags(spark, calendar_dates):
    cal = _cal(spark, calendar_dates)
    dim = cal.dim.toPandas()
    # every week_num has exactly one week-end flag
    per_week = dim.groupby("week_num")["is_week_end"].sum()
    assert (per_week == 1).all()
    q_ends = dim[dim.is_quarter_end]["date"].tolist()
    assert 20220331 in q_ends and 20220930 in q_ends
