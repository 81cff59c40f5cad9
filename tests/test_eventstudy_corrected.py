"""Kolari-Pape-Pynnönen corrected event-study inference vs an independent
numpy replication of the reference math (eventstudy.py:180-280 `fit`,
filters.py:25-97 `_normalize`/`fft_align`)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from financial_data_science_spark.backtesting.eventstudy import corrected_stats
from financial_data_science_spark.plans.calendar import TradingCalendar

LEFT, RIGHT, POST = -2, 2, 6


@pytest.fixture(scope="module")
def cb_fixture(spark, calendar_dates):
    """Per-event CAR long frame on the synthetic trading calendar: 40
    events over 25 distinct announce dates (deliberate same-date clusters
    and overlapping post windows so tau and rho both bite)."""
    rng = np.random.default_rng(7)
    n = len(calendar_dates)
    anchors = sorted(rng.choice(np.arange(20, n - 20), size=25, replace=False))
    rows = []
    for ev_id, k in enumerate(np.repeat(anchors, [2 if a % 3 == 0 else 1 for a in range(25)])[:40]):
        drift = rng.normal(0.001, 0.003)
        car = 0.0
        for rel in range(LEFT, POST + 1):
            car += drift + rng.normal(0, 0.01)
            rows.append((ev_id, int(calendar_dates[k]), rel, car))
    pdf = pd.DataFrame(rows, columns=["event_id", "adate", "rel", "car"])
    return spark.createDataFrame(pdf), pdf


def _reference_fit(pdf: pd.DataFrame, calendar_dates: list[int], rho=None):
    """Independent pandas/numpy replication of the reference `fit`."""
    wide = pdf.pivot_table(index=["event_id", "adate"], columns="rel", values="car")
    cumret = wide.groupby("adate").mean()  # portfolio method
    m = len(cumret)
    D = POST - RIGHT
    # tau: average truncated pairwise overlap of post windows
    didx = {d: i for i, d in enumerate(calendar_dates)}
    idx = np.sort([didx[d] for d in cumret.index])
    overlap = []
    for k, v in enumerate(idx[:-1]):
        x = D - (idx[k + 1 :] - v)
        x[x < 0] = 0
        overlap.extend(x.tolist())
    tau = np.mean(overlap) / D
    if rho is None:
        # filters.py:67-97 fft_align on post-window log diffs
        rets = (
            np.log(1 + cumret.where(cumret > -0.99, -0.99))
            .diff(axis=1)
            .iloc[:, RIGHT - LEFT + 1 :]
            .fillna(0)
        )
        X = rets.values.T  # D x m
        N = X.shape[0]
        Xn = X - X.mean(axis=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            Xn = Xn / np.linalg.norm(Xn, axis=0)
        Xp = np.pad(Xn, [(0, N), (0, 0)])
        Yf = np.fft.rfft(np.flipud(Xp), axis=0)
        Xf = np.fft.rfft(Xp, axis=0)
        corr = []
        for col in range(X.shape[1] - 1):
            conv = np.fft.irfft(Xf[:, [col]] * Yf[:, col + 1 :], axis=0)
            corr.extend(np.max(conv, axis=0).tolist())
        rho = float(np.nanmean(corr))
    effective = m / (1 + rho * tau * (m - 1))
    mw = cumret[RIGHT].mean()
    sw = cumret[RIGHT].std(ddof=1)
    seg = cumret[POST] - cumret[RIGHT]
    return {
        "window_mean": mw,
        "window_t": mw / (sw / np.sqrt(effective)),
        "post_mean": seg.mean(),
        "post_t": seg.mean() / (seg.std(ddof=1) / np.sqrt(effective)),
        "rho": rho,
        "tau": tau,
        "effective": effective,
        "n_dates": m,
        "n_events": pdf[["event_id", "adate"]].drop_duplicates().shape[0],
    }


def _run(spark, cb, calendar_dates, rho):
    cal = TradingCalendar.from_dates(
        spark.createDataFrame(pd.DataFrame({"date": calendar_dates}))
    )
    return (
        corrected_stats(
            cb, cal, LEFT, RIGHT, POST,
            event_keys=["event_id", "adate"], event_date="adate",
            value="car", rho=rho,
        )
        .toPandas()
        .iloc[0]
    )


def test_fixed_rho_matches_reference(spark, calendar_dates, cb_fixture):
    cb, pdf = cb_fixture
    got = _run(spark, cb, calendar_dates, rho=0.3)
    want = _reference_fit(pdf, calendar_dates, rho=0.3)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12), k


def test_fft_rho_matches_reference(spark, calendar_dates, cb_fixture):
    """rho=None: the Spark pipeline's FFT rho estimate equals the numpy
    replication of fft_align, and all corrected stats follow."""
    cb, pdf = cb_fixture
    got = _run(spark, cb, calendar_dates, rho=None)
    want = _reference_fit(pdf, calendar_dates, rho=None)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-7), k


def test_effective_shrinks_with_clustering(spark, calendar_dates, cb_fixture):
    """Sanity: positive rho*tau must shrink effective N below n_dates."""
    cb, _ = cb_fixture
    got = _run(spark, cb, calendar_dates, rho=0.5)
    assert got["effective"] < got["n_dates"]
    assert 0 < got["tau"] < 1
