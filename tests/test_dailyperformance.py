"""daily_performance vs an exact pandas replication of the reference's
day-loop (backtesting/dailyperformance.py:24-48)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from financial_data_science_spark.backtesting.dailyperformance import (
    daily_performance,
)


def _reference_loop(holdings: dict, daily: pd.DataFrame, dates: list) -> dict:
    """The reference algorithm verbatim: loop days, perf from current
    weights, then rebalance-or-drift."""
    rebals = sorted(holdings)
    curr = holdings[rebals[0]]
    perf = {}
    for date in dates[1:]:
        ret = daily[daily.date == date].set_index("permno")[["ret", "retx"]].dropna()
        perf[date] = float(
            (curr * ret["ret"].reindex(curr.index, fill_value=0)).sum()
        )
        if date in rebals:
            curr = holdings[date]
        else:
            curr = curr * (1 + ret["retx"].reindex(curr.index).fillna(0))
    return perf


def test_daily_performance_matches_reference_loop(spark):
    rng = np.random.default_rng(23)
    dates = list(range(20230101, 20230113))  # 12 "days" (int labels)
    permnos = [10, 20, 30]
    rows = []
    for d in dates:
        for p in permnos:
            if rng.random() < 0.15:  # missing rows: name absent some days
                continue
            rows.append(
                (p, d, float(rng.normal(0, 0.02)), float(rng.normal(0, 0.02)))
            )
    daily = pd.DataFrame(rows, columns=["permno", "date", "ret", "retx"])
    holdings = {
        20230101: pd.Series({10: 0.5, 20: 0.3, 30: 0.2}),
        20230106: pd.Series({10: 0.1, 20: 0.4, 30: 0.5}),
    }
    want = _reference_loop(holdings, daily, dates)

    hold_rows = [
        (rd, int(p), float(w))
        for rd, ser in holdings.items()
        for p, w in ser.items()
    ]
    hdf = spark.createDataFrame(hold_rows, "rebaldate int, permno int, weight double")
    ddf = spark.createDataFrame(daily, "permno int, date int, ret double, retx double")
    got = {
        r.date: r.ret for r in daily_performance(hdf, ddf).collect()
    }
    # every date with any daily rows must match the loop's value
    for d, v in want.items():
        if d in got:
            assert got[d] == pytest.approx(v, abs=1e-12), d
        else:
            assert v == pytest.approx(0.0)  # no rows that day -> loop got 0
    assert len(got) >= len(want) - 2
