"""Tick cleaning + binning vs pandas resample oracle (A11, P7)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.operators import bin_trades, clean_trades


def test_clean_trades_filters(spark, trades_pdf):
    t = spark.createDataFrame(trades_pdf)
    out = clean_trades(t).toPandas()
    assert (out["corr"] == 0).all()
    assert (~out["cond"].str.contains("[MOZBTLGWJK145789]", regex=True)).all()
    want = trades_pdf[
        (trades_pdf["corr"] == 0)
        & (trades_pdf.price > 0)
        & (trades_pdf.volume > 0)
        & ~trades_pdf["cond"].str.contains("[MOZBTLGWJK145789]", regex=True)
    ]
    assert len(out) == len(want)


def test_bin_trades_vs_pandas_resample(spark, trades_pdf):
    t = clean_trades(spark.createDataFrame(trades_pdf))
    got = (
        bin_trades(t, seq_col="seq")
        .toPandas()
        .sort_values(["symbol", "bin"])
        .reset_index(drop=True)
    )
    clean = trades_pdf[
        (trades_pdf["corr"] == 0) & ~trades_pdf["cond"].str.contains("Z")
    ]
    want = []
    for sym, g in clean.groupby("symbol"):
        g = g.sort_values(["time", "seq"]).set_index("time")
        r = g.resample("5min", label="right", closed="left")
        agg = pd.DataFrame(
            {
                "n_trades": r["price"].count(),
                "volume": r["volume"].sum(),
                "first_price": r["price"].first(),
                "last_price": r["price"].last(),
                "max_price": r["price"].max(),
                "min_price": r["price"].min(),
                "vwap": r.apply(lambda x: np.average(x.price, weights=x.volume) if len(x) else np.nan),
            }
        ).dropna(subset=["first_price"])
        agg["symbol"] = sym
        want.append(agg.reset_index().rename(columns={"time": "bin"}))
    want = pd.concat(want).sort_values(["symbol", "bin"]).reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_allclose(got["volume"], want["volume"])
    np.testing.assert_allclose(got["vwap"], want["vwap"], rtol=1e-9)
    np.testing.assert_allclose(got["first_price"], want["first_price"], rtol=1e-12)
    np.testing.assert_allclose(got["last_price"], want["last_price"], rtol=1e-12)
