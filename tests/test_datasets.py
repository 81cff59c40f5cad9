"""Dataset facades vs pandas oracles (CRSP/Signals/links semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_science_spark.datasets import (
    CRSP,
    Benchmarks,
    Signals,
    Stocks,
    get_linked,
    get_permnos,
)


@pytest.fixture(scope="module")
def crsp(spark, daily, names_pdf):
    return CRSP(daily, names=spark.createDataFrame(names_pdf))


def test_get_section_prevailing(spark, daily, daily_pdf):
    s = Stocks(daily)
    got = s.get_section("daily", ["prc"], 20230630).toPandas()
    sl = daily_pdf[daily_pdf.date <= 20230630]
    want = sl.sort_values("date").groupby("permno").last()["prc"]
    m = got.set_index("permno")["prc"].sort_index()
    np.testing.assert_allclose(m.to_numpy(), want.sort_index().to_numpy(), rtol=1e-12)


def test_get_cap_permco_window_sum(crsp, daily_pdf, names_pdf):
    got = crsp.get_cap(20230331, use_permco=True).toPandas()
    # two permnos share a permco: capco is their summed cap
    nm = names_pdf[names_pdf.date <= 20230331].sort_values("date").groupby("permno").last()
    merged = got.merge(nm["permco"], left_on="permno", right_index=True)
    want = merged.groupby("permco_y")["cap"].transform("sum")
    np.testing.assert_allclose(merged["capco"], want, rtol=1e-9)


def test_get_universe_screens(crsp):
    uni = crsp.get_universe(20230331).toPandas()
    assert set(uni["shrcd"]) <= {10, 11}
    assert set(uni["exchcd"]) <= {1, 2, 3}
    assert (uni["cap"] > 0).all()
    assert uni["decile"].between(1, 10).all()
    # descending: decile 1 = biggest caps
    top = uni[uni.decile == 1]["capco"].min()
    bot = uni[uni.decile == 10]["capco"].max()
    assert top >= bot


def test_get_ret_with_delist(spark, monthly_pdf, daily):
    crsp = CRSP(daily, monthly=spark.createDataFrame(monthly_pdf))
    got = (
        crsp.get_ret_with_delist(20241101, 20241231)
        .toPandas()
        .set_index("permno")["ret"]
    )
    base = monthly_pdf[
        (monthly_pdf.date >= 20241101) & (monthly_pdf.date <= 20241231)
    ]
    # permno 10001: code 500 null dlret -> (1+ret)(0.7)-1 on the delist row
    r = base[(base.permno == 10001) & (base.dlstcd == 0)]["ret"]
    dl_row = base[(base.permno == 10001) & (base.dlstcd == 500)]["ret"].iloc[0]
    want = np.prod(1 + r) * ((1 + dl_row) * 0.7) - 1
    np.testing.assert_allclose(got[10001], want, rtol=1e-9)
    # permno 10002: code 100 not in default set, null dlret -> unadjusted
    r2 = base[base.permno == 10002]["ret"]
    np.testing.assert_allclose(got[10002], np.prod(1 + r2) - 1, rtol=1e-9)


def test_get_linked_asof_switch(spark, links_pdf):
    links = spark.createDataFrame(links_pdf)
    data = spark.createDataFrame(
        pd.DataFrame(
            {
                "gvkey": [2001, 2001, 2002, 2003],
                "datadate": [20230101, 20230801, 20220601, 20230101],
                "x": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    out = get_linked(data, links).toPandas().set_index(["gvkey", "datadate"])
    assert out.loc[(2001, 20230101), "lpermno"] == 10001  # first link prevails
    assert out.loc[(2001, 20230801), "lpermno"] == 10002  # switched
    assert out.loc[(2002, 20220601), "lpermno"] == 10003  # linkdt=0 open start
    assert np.isnan(out.loc[(2003, 20230101), "lpermno"])  # LD screened out


def test_get_linked_enforce_end(spark, links_pdf):
    links = spark.createDataFrame(links_pdf)
    data = spark.createDataFrame(
        pd.DataFrame({"gvkey": [2001], "datadate": [20230640], "x": [1.0]})
    )
    # 20230640 > linkenddt 20230630 of the first link, before second starts
    out = get_linked(data, links).toPandas()
    assert np.isnan(out["lpermno"].iloc[0])


def test_get_permnos_fixed_date(spark, links_pdf):
    links = spark.createDataFrame(links_pdf)
    keys = spark.createDataFrame(pd.DataFrame({"gvkey": [2001, 2002, 2003, 2099]}))
    out = get_permnos(keys, links, 20240101).toPandas().set_index("gvkey")["lpermno"]
    assert out[2001] == 10002
    assert out[2002] == 10003
    assert out[2003] == 0 and out[2099] == 0


def test_signals_roundtrip(spark, tmp_path):
    sig = Signals(str(tmp_path / "signals"))
    pdf = pd.DataFrame(
        {
            "permno": [1, 1, 2, 2, 3],
            "rebaldate": [20230131, 20230228, 20230131, 20230131, 20230131],
            "mom": [0.5, 0.6, np.inf, 0.7, np.nan],
        }
    )
    n = sig.write(spark.createDataFrame(pdf), "mom")
    assert n == 3  # inf + nan dropped, dup PK deduped
    prevailing = sig(spark, "mom", 20230315, 20221231).toPandas().set_index("permno")
    assert prevailing.loc[1, "mom"] == 0.6  # latest <= date
    assert prevailing.loc[2, "mom"] == 0.7


def test_benchmarks_from_wide(spark):
    wide = spark.createDataFrame(
        pd.DataFrame(
            {"date": [20230131, 20230228], "Mkt-RF": [0.01, -0.02], "RF": [0.001, 0.001]}
        )
    )
    b = Benchmarks.from_wide(wide)
    out = b.get_series(["Mkt-RF"], 20230101, 20231231).toPandas()
    assert out["permno"].tolist() == ["Mkt-RF", "Mkt-RF"]
    np.testing.assert_allclose(sorted(out["ret"]), [-0.02, 0.01])


def test_pstat_keydev_labels(spark):
    from financial_data_science_spark.datasets.pstat import (
        KEYDEV_EVENTS,
        KEYDEV_ROLES,
        PSTAT,
    )

    df = spark.createDataFrame(
        [(28, 1), (47, 3), (999, 14), (85, 99)],
        "keydeveventtypeid int, keydevtoobjectroletypeid int",
    )
    got = PSTAT(spark).label_keydev(df).toPandas()
    lut = got.set_index("keydeveventtypeid")
    assert lut.loc[28, "event_label"] == KEYDEV_EVENTS[28]
    assert lut.loc[999, "event_label"] == "Other"
    assert lut.loc[85, "role_label"] == "Other"  # role 99 unknown
    assert (
        got.set_index("keydevtoobjectroletypeid").loc[3, "role_label"]
        == KEYDEV_ROLES[3]
    )


def test_ibes_link_bridge(spark):
    """write_links as-of semantics: max names.date <= sdates per cusip;
    unmatched idents keep null permno (ibes.py:131-158)."""
    import pandas as pd

    from financial_data_science_spark.datasets.links import (
        build_ibes_links,
        ibes_get_permnos,
    )

    idents = spark.createDataFrame(
        pd.DataFrame(
            {
                "ticker": ["AAA", "AAA", "BBB", "CCC"],
                "sdates": [20200115, 20210115, 20200601, 20200601],
                "cusip": ["11111111", "11111111", "22222222", "33333333"],
                "cname": ["A Corp", "A Corp", "B Corp", "C Corp"],
            }
        )
    )
    names = spark.createDataFrame(
        pd.DataFrame(
            {
                "ncusip": ["11111111", "11111111", "22222222"],
                "date": [20200101, 20200701, 20200301],
                "comnam": ["A OLD", "A NEW", "B CO"],
                "permno": [101, 101, 202],
            }
        )
    )
    links = build_ibes_links(idents, names).toPandas().set_index(["ticker", "sdates"])
    assert links.loc[("AAA", 20200115), "comnam"] == "A OLD"   # 0101 <= 0115
    assert links.loc[("AAA", 20210115), "comnam"] == "A NEW"   # 0701 <= 2021
    assert links.loc[("BBB", 20200601), "permno"] == 202
    assert pd.isna(links.loc[("CCC", 20200601), "permno"])     # no cusip match
    ldf = build_ibes_links(idents, names)
    t = spark.createDataFrame(pd.DataFrame({"ticker": ["AAA", "BBB", "ZZZ"]}))
    pm = ibes_get_permnos(ldf, t, 20200701).toPandas().set_index("ticker")["permno"]
    assert pm["AAA"] == 101 and pm["BBB"] == 202 and pm["ZZZ"] == 0
