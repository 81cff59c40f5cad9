"""Round-trip tests for the pluggable reader transport (SURVEY §2.1
S9/S11/S14/S16/S17): recorded-format fixture payloads -> fetch seam ->
parse -> Spark frame -> the already-checked transform kernels, asserted
against independent pandas replays."""

import gzip
import json

import numpy as np
import pandas as pd
import pytest

from financial_data_science_spark.sources.transport import (
    AlfredReader,
    BEAReader,
    EdgarIndexReader,
    FixtureFetcher,
    FOMCReader,
    YahooReader,
    alfred_url,
    bea_url,
    edgar_daily_index_url,
    edgar_full_index_url,
    fomc_minutes_links,
    fomc_minutes_text,
    fred_url,
    yahoo_history_url,
)

# ------------------------------------------------------------------ ALFRED

ALFRED_PAYLOAD = json.dumps(
    {
        "realtime_start": "2024-01-01",
        "realtime_end": "2024-12-31",
        "observations": [
            # two vintages for 2023-01-01, one current-window row to backfill
            {"date": "2023-01-01", "realtime_start": "2023-02-01",
             "realtime_end": "2023-02-28", "value": "100.0"},
            {"date": "2023-01-01", "realtime_start": "2023-03-01",
             "realtime_end": "2024-12-31", "value": "101.5"},
            {"date": "2023-02-01", "realtime_start": "2024-01-01",
             "realtime_end": "2024-12-31", "value": "."},
            {"date": "2023-03-01", "realtime_start": "2023-04-01",
             "realtime_end": "2024-12-31", "value": "103.25"},
        ],
    }
)


def test_alfred_observations_roundtrip(spark):
    url = alfred_url("series/observations", "GDPC1", "1776-07-04",
                     "9999-12-31", "k")
    rdr = AlfredReader(api_key="k", fetch=FixtureFetcher({url: ALFRED_PAYLOAD}))
    out = rdr.series_observations(spark, "GDPC1").toPandas()
    assert list(out.columns) == ["series_id", "date", "realtime_start", "value"]
    assert (out["series_id"] == "GDPC1").all()
    # '.' missing marker -> null, dates -> yyyymmdd ints
    assert out.loc[out["date"] == 20230201, "value"].isna().all()
    assert out["realtime_start"].tolist() == [20230201, 20230301, 20240101,
                                              20230401]

    # feeds the oracle-checked vintage kernel: latest release per date
    from financial_data_science_spark.sources.vintages import latest_release

    latest = (
        latest_release(rdr.series_observations(spark, "GDPC1"))
        .toPandas().set_index("date")["value"]
    )
    assert latest[20230101] == 101.5 and latest[20230301] == 103.25


def test_alfred_fred_fallback_and_archive_backfill(spark):
    # ALFRED url absent from fixtures -> transport error -> FRED url tried
    furl = fred_url("series/observations", "GDPC1", "k")
    fetch = FixtureFetcher({furl: ALFRED_PAYLOAD})
    rdr = AlfredReader(api_key="k", fetch=fetch)
    out = rdr.series_observations(spark, "GDPC1", archive=True).toPandas()
    assert len(fetch.requested) == 2 and fetch.requested[1] == furl
    # archive rule: rows still carrying the request window get
    # realtime_start backfilled to their observation date
    backfilled = out.set_index("date")["realtime_start"]
    assert backfilled[20230201] == 20230201          # was 2024-01-01 window row
    assert backfilled[20230101].tolist() == [20230201, 20230301]  # untouched


# --------------------------------------------------------------------- BEA

BEA_PAYLOAD = json.dumps(
    {
        "BEAAPI": {
            "Results": [
                {
                    "Data": [
                        {"RowCode": "111", "ColCode": "111", "DataValue  ": 5.0},
                        {"RowCode": "111", "ColCode": "112", "DataValue  ": 7.0},
                        {"RowCode": "112", "ColCode": "111", "DataValue  ": 11.0},
                        {"RowCode": "211", "ColCode": "112", "DataValue  ": 13.0},
                    ]
                }
            ]
        }
    }
)


def test_bea_get_data_roundtrip_regroup(spark):
    url = bea_url("uid", "ioUse", tableid=259, year=2023)
    assert "method=GetData" in url and "tableid=259" in url
    rdr = BEAReader("uid", fetch=FixtureFetcher({url: BEA_PAYLOAD}))
    df = rdr.get(spark, "ioUse", tableid=259, year=2023)
    # columns lowercased and right-stripped (bea.py:326)
    assert set(df.columns) == {"rowcode", "colcode", "datavalue"}

    # feeds the oracle-checked regroup kernel (A15)
    from financial_data_science_spark.sources.readers import regroup_codes

    mapping = spark.createDataFrame(
        [("111", "farm"), ("112", "farm"), ("211", "mining")], "code string, sector string"
    )
    got = (
        regroup_codes(df, mapping, ["rowcode", "colcode"])
        .toPandas()
        .set_index(["rowcode_group", "colcode_group"])["datavalue"]
        .sort_index()
    )
    assert got[("farm", "farm")] == 23.0 and got[("mining", "farm")] == 13.0


def test_bea_method_selection_urls():
    assert bea_url("u").endswith("GETDATASETLIST")
    assert bea_url("u", "ioUse").endswith("method=GetParameterList")
    assert "GetParameterValues" in bea_url("u", "ioUse", "TableID")
    assert "Frequency=A,Q" in bea_url("u", "NIPA", Frequency=["A", "Q"])


# ------------------------------------------------------------------- EDGAR

MASTER_IDX = (
    "Description: master index\n"
    "-------------------------\n"
    "CIK|Company Name|Form Type|Date Filed|Filename\n"
    "320193|APPLE INC|10-K|2023-10-27|edgar/data/320193/a.txt\n"
    "320193|APPLE INC|10-K|2023-10-27|edgar/data/320193/a.txt\n"
    "789019|MICROSOFT CORP|10-Q|2023-10-24|edgar/data/789019/m.txt\n"
)


def test_edgar_full_index_parse(spark):
    url = edgar_full_index_url(2023, 4)
    assert url.endswith("2023/QTR4/master.idx")
    rdr = EdgarIndexReader(fetch=FixtureFetcher({url: MASTER_IDX}))
    out = rdr.full_index(spark, 2023, 4).toPandas().sort_values("cik")
    # junk header rows dropped (non-digit cik/date), dup filing dropped
    assert len(out) == 2
    assert out["cik"].tolist() == [320193, 789019]
    assert out["date"].tolist() == [20231027, 20231024]
    assert out["pathname"].iloc[0] == "edgar/data/320193/a.txt"


def test_edgar_daily_gz_with_legacy_fallback(spark):
    date = 20230214
    legacy = edgar_daily_index_url(date, gz=False)
    assert legacy.endswith("2023/QTR1/master.021423.idx")
    gz_payload = gzip.compress(MASTER_IDX.encode())
    # gz url present: served and decompressed transparently
    fetch = FixtureFetcher({edgar_daily_index_url(date): gz_payload})
    assert len(EdgarIndexReader(fetch=fetch).daily_index(spark, date).toPandas()) == 2
    # gz url missing: legacy mmddyy name fetched instead
    fetch2 = FixtureFetcher({legacy: MASTER_IDX})
    out = EdgarIndexReader(fetch=fetch2).daily_index(spark, date).toPandas()
    assert len(out) == 2 and fetch2.requested[-1] == legacy


# -------------------------------------------------------------------- FOMC

CALENDAR_HTM = """
<html><body>
<a href="monetarypolicy/fomcminutes20240131.htm">Minutes</a>
<a href="/monetarypolicy/fomcminutes20240320.htm">Minutes</a>
<a href="monetarypolicy/fomccalendars.htm">calendar</a>
</body></html>
"""

HIST_HTM = """
<html><body><a href="monetarypolicy/fomcminutes19930203.htm">Minutes</a></body></html>
"""

MINUTES_HTM = """
<html><body>
<p>The Committee met  at 9:00.</p>
<p>Inflation\tremained   elevated.</p>
<div>not a paragraph</div>
</body></html>
"""


def test_fomc_links_and_text():
    links = fomc_minutes_links(CALENDAR_HTM.encode())
    assert set(links) == {20240131, 20240320}
    assert links[20240131].endswith("monetarypolicy/fomcminutes20240131.htm")
    text = fomc_minutes_text(MINUTES_HTM.encode())
    assert "Committee met" in text and "Inflation" in text
    assert "not a paragraph" not in text and "\t" not in text


def test_fomc_reader_walks_history_and_builds_table(spark):
    root = "https://www.federalreserve.gov/"
    fixtures = {
        root + "monetarypolicy/fomccalendars.htm": CALENDAR_HTM,
        root + "monetarypolicy/fomcminutes20240131.htm": MINUTES_HTM,
        root + "monetarypolicy/fomcminutes19930203.htm": MINUTES_HTM,
    }
    # historical pages 1993..2023 must all be walked (fomcreader.py:42-50)
    for y in range(1993, 2024):
        fixtures.setdefault(root + f"monetarypolicy/fomchistorical{y}.htm",
                            HIST_HTM if y == 1993 else "<html></html>")
    rdr = FOMCReader(fetch=FixtureFetcher(fixtures))
    dates = rdr.dates()
    assert {20240131, 20240320, 19930203} <= set(dates)
    tbl = rdr.minutes_table(spark, [20240131]).toPandas()
    assert len(tbl) == 1 and "Committee met" in tbl["text"].iloc[0]

    # feeds the oracle-checked text-quality pipeline
    from financial_data_science_spark.functions.text import quality_features

    tbl2 = rdr.minutes_table(spark, [20240131, 19930203])
    q = tbl2.select(
        "date", *[v.alias(k) for k, v in quality_features("text").items()]
    ).toPandas()
    assert len(q) == 2 and (q["n_chars"] > 0).all()


# ------------------------------------------------------------------- Yahoo

YAHOO_CSV = (
    "Date,Open,High,Low,Close,Adj Close,Volume,Dividends,Stock Splits\n"
    "2024-01-02,10,11,9,10.0,10.0,1000,0,0\n"
    "2024-01-03,10,11,9,11.0,11.0,1100,0.5,0\n"
    "2024-01-04,5,6,4,5.5,5.5,2400,0,2.0\n"
    "2024-01-05,5,6,4,5.6,5.6,2500,0,0\n"
)


def test_yahoo_history_and_split_adjustment(spark):
    url = yahoo_history_url("AAPL", 0, 9999999999)
    rdr = YahooReader(fetch=FixtureFetcher({url: YAHOO_CSV}))
    raw = rdr.history(spark, "AAPL")
    adj = YahooReader.adjusted(raw).toPandas().sort_values("date")

    # pandas replay of the reference factor (real_time.py:71-80):
    # shift(-1) then reversed inclusive cumprod == reversed EXCLUSIVE cumprod
    pdf = pd.read_csv(pd.io.common.StringIO(YAHOO_CSV))
    split = (
        pdf["Stock Splits"].where(pdf["Stock Splits"] != 0.0, 1)
        .shift(-1).fillna(1).iloc[::-1].cumprod().iloc[::-1]
    )
    np.testing.assert_allclose(adj["vol"], pdf["Volume"] / split)
    np.testing.assert_allclose(adj["divamt"], pdf["Dividends"] * split)
    np.testing.assert_allclose(adj["prc"], pdf["Close"] * split)
    # rows before the 2:1 split are back-adjusted by 2x, after are not
    assert adj.set_index("date")["prc"].loc[20240102] == 20.0
    assert adj.set_index("date")["prc"].loc[20240105] == 5.6
