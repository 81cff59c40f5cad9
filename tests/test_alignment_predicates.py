"""W8 trade-quote alignment, P5/P6 predicates, J3 Lookup, S18/S19 stores."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.datasets.lookup import Lookup, Sectoring, Store
from financial_data_science_spark.functions.predicates import (
    find_identifier,
    guess_id_column,
    parse_where,
    where,
)
from financial_data_science_spark.operators.alignment import align_trades, tick_sign
from financial_data_science_spark.operators.binning import (
    clean_quotes,
    time_weighted_quote_aggs,
)


def test_align_trades_prev_and_fwd(spark):
    quotes = spark.createDataFrame(
        pd.DataFrame(
            {
                "symbol": ["A"] * 4,
                "time": pd.to_datetime(
                    ["2024-01-01 09:30:00", "2024-01-01 09:31:00",
                     "2024-01-01 09:40:00", "2024-01-01 09:50:00"]
                ),
                "bid": [99.0, 100.0, 101.0, 102.0],
                "ask": [101.0, 102.0, 103.0, 104.0],
            }
        )
    )
    trades = spark.createDataFrame(
        pd.DataFrame(
            {
                "symbol": ["A", "A", "A"],
                "time": pd.to_datetime(
                    ["2024-01-01 09:31:00", "2024-01-01 09:35:00",
                     "2024-01-01 09:29:00"]
                ),
                "price": [101.0, 102.0, 100.0],
            }
        )
    )
    out = (
        align_trades(trades, quotes, horizon_seconds=300)
        .toPandas()
        .sort_values("time")
        .reset_index(drop=True)
    )
    # trade at 09:29 has no prior quote
    assert np.isnan(out.loc[0, "prev_mid"])
    # trade at exactly 09:31 must see the 09:30 quote (strictly before)
    assert out.loc[1, "prev_mid"] == 100.0
    # its forward mid at 09:36 is the 09:31 quote's mid
    assert out.loc[1, "fwd_mid"] == 101.0
    # trade at 09:35: prev = 09:31 mid; fwd at 09:40 = 102.0
    assert out.loc[2, "prev_mid"] == 101.0 and out.loc[2, "fwd_mid"] == 102.0


def test_tick_sign_carries_zero_ticks(spark):
    t = spark.createDataFrame(
        pd.DataFrame(
            {
                "symbol": ["A"] * 5,
                "time": range(5),
                "price": [10.0, 10.5, 10.5, 10.2, 10.2],
            }
        )
    )
    out = (
        t.withColumn("sgn", tick_sign())
        .toPandas()
        .sort_values("time")["sgn"]
        .tolist()
    )
    assert out[1:] == [1.0, 1.0, -1.0, -1.0]  # zero ticks carry prior sign


def test_clean_quotes_and_tw_aggs(spark):
    q = spark.createDataFrame(
        pd.DataFrame(
            {
                "symbol": ["A"] * 4,
                "time": pd.to_datetime(
                    ["2024-01-01 09:30:00", "2024-01-01 09:30:30",
                     "2024-01-01 09:31:00", "2024-01-01 09:31:30"]
                ),
                "bid": [99.0, 0.0, 100.0, 90.0],
                "ask": [101.0, 101.0, 99.0, 104.0],  # crossed at row 3
                "bidsiz": [1.0, 1.0, 1.0, 1.0],
                "asksiz": [1.0, 1.0, 1.0, 1.0],
                "cancel": [None, None, None, "B"],
            }
        )
    )
    out = clean_quotes(q).toPandas()
    assert len(out) == 1 and out["bid"].iloc[0] == 99.0


def test_parse_where_ops(spark, daily):
    out = where(
        daily,
        {"permno_eq": 10001, "date_ge": 20230101, "date_le": 20231231},
    ).toPandas()
    assert (out["permno"] == 10001).all()
    assert out["date"].between(20230101, 20231231).all()
    tup = where(daily, {"permno": (10001, 10003)}).toPandas()
    assert tup["permno"].between(10001, 10003).all()
    notin = where(daily, {"permno_notin": list(range(10002, 10051))}).toPandas()
    assert set(notin["permno"]) == {10001}
    exists = where(daily.limit(50), "ret").toPandas()
    assert exists["ret"].notna().all()


def test_guess_and_find(spark, names_pdf):
    assert guess_id_column(10001) == "permno"
    assert guess_id_column("03783310") == "cusip"
    assert guess_id_column("AAPL") == "ticker"
    assert guess_id_column("International Business") == "comnam"
    names = spark.createDataFrame(names_pdf)
    hit = find_identifier(names, "CO10005")  # name LIKE fallback
    assert hit.count() == 2  # A and B history rows


def test_lookup_prevailing_and_earliest(spark):
    dim = spark.createDataFrame(
        pd.DataFrame(
            {
                "permno": [1, 1, 2],
                "date": [20230101, 20230601, 20230301],
                "exch": ["NYSE", "AMEX", "NASD"],
            }
        )
    )
    lk = Lookup(dim, "permno", "date", "exch")
    df = spark.createDataFrame(
        pd.DataFrame({"permno": [1, 1, 2], "d": [20230401, 20230701, 20230101]})
    )
    out = lk.apply(df, "permno", "d").toPandas().set_index("d")["exch"]
    assert out[20230401] == "NYSE" and out[20230701] == "AMEX"
    assert out[20230101] == "NASD"  # before first record -> earliest value
    assert lk(spark, 1, 20230215) == "NYSE"


def test_sectoring_range_lookup(spark):
    ranges = spark.createDataFrame(
        pd.DataFrame({"code": [0, 1000, 2000], "name": ["ag", "mining", "mfg"]})
    )
    s = Sectoring(ranges)
    df = spark.createDataFrame(pd.DataFrame({"siccd": [500, 1000, 1999, 2500]}))
    out = s.apply(df, "siccd").toPandas().set_index("siccd")["sector"]
    assert out[500] == "ag" and out[1000] == "mining"
    assert out[1999] == "mining" and out[2500] == "mfg"


def test_store_roundtrip(spark, tmp_path):
    st = Store(str(tmp_path))
    df = spark.createDataFrame(pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}))
    st.dump(df, "tbl")
    assert "tbl" in st
    back = st.load(spark, "tbl").toPandas().sort_values("a")
    assert back["b"].tolist() == ["x", "y"]


def test_users_click_no_purchase_window_is_data_sensitive(spark):
    """r13 verdict item 4: the un-windowed anti-join is vacuous on the
    synthetic events table (every clicker also purchases over the full
    month), so its hash cannot falsify a broken left_anti.  The windowed
    variant must return a NON-EMPTY set at sf0.01 that is (a) a subset of
    week-1 clickers and (b) disjoint from week-1 buyers — the pandas
    set-difference oracle checked exactly."""
    from financial_data_science_spark.queries import Q

    sf_dir = "/root/testdata/sf0.01"
    out = set(
        Q["users_click_no_purchase_window"](spark, sf_dir)
        .toPandas()["user_id"]
        .tolist()
    )
    assert out, "windowed anti-join must be non-empty at sf0.01"

    ev = pd.read_parquet(sf_dir + "/events.parquet")
    week1 = ev[ev["ts"] < pd.Timestamp("2024-01-08")]
    clickers = set(week1.loc[week1["event_type"] == "click", "user_id"])
    buyers = set(week1.loc[week1["event_type"] == "purchase", "user_id"])
    assert out == clickers - buyers

    # the vacuity contrast: the full-month sibling stays empty here
    assert Q["users_click_no_purchase"](spark, sf_dir).count() == 0
