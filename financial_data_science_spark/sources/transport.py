"""Pluggable HTTP transport + fetch layer for the external-source readers
(SURVEY §2.1 S9 FRED/ALFRED, S11 BEA, S14/S15 EDGAR, S16 FOMC, S17 Yahoo).

The reference readers couple three concerns: URL construction, HTTP fetch,
and payload parsing (alfred.py:483-563, bea.py:264-331, edgar.py:125-319,
fomcreader.py:22-74, real_time.py:40-96).  Here each is separate and the
fetch is an injectable seam::

    Fetcher = Callable[[str], bytes]

so production uses :func:`urllib_fetcher` (stdlib, no extra deps) while
tests inject :class:`FixtureFetcher` with recorded responses — the readers
are fully testable without a network, and a cluster deployment can swap in
a rate-limited/cached fetcher without touching parse logic.

Parsing lands driver-side payloads into Spark DataFrames that feed the
already-oracle-checked transform kernels: vintage selection
(sources/vintages.py), IO-Use regroup (sources/readers.py), EDGAR item
extraction (functions/edgar_text.py), text pipeline (functions/text.py),
and split back-adjustment (operators/windows.py::reverse_cumprod).  The
fetch is inherently driver-side I/O in any engine; everything after
``spark.createDataFrame`` is distributed.
"""

from __future__ import annotations

import gzip
import io
import json
import re
from typing import Callable, Iterable, Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Fetcher = Callable[[str], bytes]


def urllib_fetcher(timeout: float = 30.0) -> Fetcher:
    """Default production transport: stdlib urllib GET -> bytes.

    Kept out of module import time so environments without a network never
    pay for it; errors surface as the caller's problem (the reference
    returns None and degrades — here the seam lets callers wrap with their
    own retry/backoff policy).
    """

    def fetch(url: str) -> bytes:
        from urllib.request import Request, urlopen

        req = Request(url, headers={"User-Agent": "financial-data-science-spark"})
        with urlopen(req, timeout=timeout) as r:  # noqa: S310 (seam, https)
            return r.read()

    return fetch


class FixtureFetcher:
    """Test transport: serve recorded responses from a url->bytes mapping
    and record the request order so tests can assert fallback behavior
    (e.g. ALFRED -> FRED downgrade, EDGAR .idx.gz -> .idx retry)."""

    def __init__(self, responses: Mapping[str, bytes | str]):
        self.responses = {
            u: v.encode() if isinstance(v, str) else v
            for u, v in responses.items()
        }
        self.requested: list[str] = []

    def __call__(self, url: str) -> bytes:
        self.requested.append(url)
        if url not in self.responses:
            raise KeyError(f"no fixture recorded for {url}")
        return self.responses[url]


# ------------------------------------------------------------------ FRED/ALFRED

_FRED_ROOT = "https://api.stlouisfed.org/fred"


def alfred_url(api: str, series_id: str, start: str, end: str, api_key: str) -> str:
    """Vintage (ALFRED) API url (alfred.py:483-485)."""
    return (
        f"{_FRED_ROOT}/{api}?series_id={series_id}"
        f"&realtime_start={start}&realtime_end={end}"
        f"&api_key={api_key}&file_type=json"
    )


def fred_url(api: str, series_id: str, api_key: str) -> str:
    """Current-vintage (FRED) API url (alfred.py:486-487)."""
    return f"{_FRED_ROOT}/{api}?series_id={series_id}&api_key={api_key}&file_type=json"


class AlfredReader:
    """S9: FRED/ALFRED series + observations fetch feeding the vintage
    kernels (alfred.py:534-563 request_series_observations).

    Vintage-first with current-vintage fallback: the ALFRED url is tried
    first; on transport failure the FRED url is fetched and, with
    ``archive=True``, converted to ALFRED shape by backfilling
    realtime_start = date on rows still carrying the request's realtime
    window (the reference's archive rule, alfred.py:557-561).
    """

    def __init__(
        self,
        api_key: str = "",
        start: str = "1776-07-04",
        end: str = "9999-12-31",
        fetch: Fetcher | None = None,
    ):
        self.api_key = api_key
        self.start, self.end = start, end
        self.fetch = fetch or urllib_fetcher()

    def series_observations(
        self, spark: SparkSession, series_id: str, archive: bool = False
    ) -> DataFrame:
        try:
            raw = self.fetch(
                alfred_url("series/observations", series_id, self.start,
                           self.end, self.api_key)
            )
        except Exception:
            raw = self.fetch(fred_url("series/observations", series_id, self.api_key))
        contents = json.loads(raw)
        pdf = pd.DataFrame(contents["observations"])
        if archive:
            f = (
                pdf["realtime_start"].eq(contents["realtime_start"])
                & pdf["realtime_end"].eq(contents["realtime_end"])
            ).to_numpy()
            pdf.loc[f, "realtime_start"] = pdf.loc[f, "date"]
        out = spark.createDataFrame(pdf)
        # '.' is FRED's missing marker; dates stay sortable as yyyymmdd ints
        return out.select(
            F.col("series_id") if "series_id" in pdf.columns
            else F.lit(series_id).alias("series_id"),
            F.regexp_replace("date", "-", "").cast("int").alias("date"),
            F.regexp_replace("realtime_start", "-", "").cast("int").alias(
                "realtime_start"
            ),
            F.when(F.col("value") != ".", F.col("value").cast("double")).alias(
                "value"
            ),
        )


# ------------------------------------------------------------------------- BEA

def bea_url(
    userid: str,
    datasetname: str = "",
    parametername: str = "",
    **kwargs,
) -> str:
    """BEA API url with the reference's method-selection rules
    (bea.py:287-303): no dataset -> GETDATASETLIST; parametername ->
    GetParameterValues; dataset only -> GetParameterList; dataset+params
    -> GetData."""
    url = "https://apps.bea.gov/api/data?&UserID=" + userid
    if not datasetname:
        return url + "&method=GETDATASETLIST"
    url += "&datasetname=" + datasetname
    if parametername:
        return url + "&method=GetParameterValues&parametername=" + parametername
    if not kwargs:
        return url + "&method=GetParameterList"
    url += "&method=GetData"
    for k, v in kwargs.items():
        if isinstance(v, list):
            v = ",".join(str(x) for x in v)
        url += "&" + str(k) + "=" + str(v)
    return url


class BEAReader:
    """S11: BEA web API fetch feeding the IO-Use regroup kernel
    (bea.py:264-331 get)."""

    def __init__(self, userid: str, fetch: Fetcher | None = None):
        self.userid = userid
        self.fetch = fetch or urllib_fetcher()

    def get(
        self,
        spark: SparkSession,
        datasetname: str = "",
        parametername: str = "",
        **kwargs,
    ) -> DataFrame:
        raw = self.fetch(bea_url(self.userid, datasetname, parametername, **kwargs))
        data = json.loads(raw.decode("utf-8"))
        results = data["BEAAPI"]["Results"]
        if not datasetname:
            pdf = pd.DataFrame(results["Dataset"])
        elif parametername:
            pdf = pd.DataFrame(results["ParamValue"])
        elif not kwargs:
            pdf = pd.DataFrame(results["Parameter"])
        else:
            pdf = pd.DataFrame(results[0]["Data"])
        pdf.columns = [str(c).lower().rstrip() for c in pdf.columns]
        return spark.createDataFrame(pdf)


# ----------------------------------------------------------------------- EDGAR

_EDGAR_FULL = "https://www.sec.gov/Archives/edgar/full-index"
_EDGAR_DAILY = "https://www.sec.gov/Archives/edgar/daily-index"


def edgar_full_index_url(year: int, quarter: int) -> str:
    """Quarterly master index url (edgar.py:142-147)."""
    return f"{_EDGAR_FULL}/{year}/QTR{quarter}/master.idx"


def edgar_daily_index_url(date: int, gz: bool = True) -> str:
    """Daily master index url; the gz form is tried first, then the legacy
    mmddyy .idx name (edgar.py:168-181)."""
    q = (((date // 100) % 100) + 2) // 3
    if gz:
        return f"{_EDGAR_DAILY}/{date // 10000}/QTR{q}/master.{date}.idx.gz"
    d = ((date // 10000) % 100) + ((date % 10000) * 100)
    return f"{_EDGAR_DAILY}/{date // 10000}/QTR{q}/master.{d:06d}.idx"


def parse_master_idx(spark: SparkSession, payload: bytes) -> DataFrame:
    """Parse a pipe-delimited EDGAR master index into (cik, name, form,
    date, pathname), dropping header/separator junk rows exactly as the
    reference does: keep rows whose cik AND date are all-digits, dedup on
    the full filing key (edgar.py:151-163)."""
    if payload[:2] == b"\x1f\x8b":
        payload = gzip.decompress(payload)
    pdf = pd.read_csv(
        io.BytesIO(payload), sep="|", quoting=3, encoding="latin-1",
        header=None, dtype="str", na_filter=False,
        names=["cik", "name", "form", "date", "pathname"],
    )
    pdf["date"] = pdf["date"].str.replace("-", "", regex=False)
    pdf = pdf[pdf["date"].str.isdigit() & pdf["cik"].str.isdigit()]
    pdf = pdf.drop_duplicates(["pathname", "date", "form", "cik"])
    out = spark.createDataFrame(pdf)
    return out.select(
        F.col("cik").cast("int").alias("cik"),
        "name", "form",
        F.col("date").cast("int").alias("date"),
        "pathname",
    )


class EdgarIndexReader:
    """S14: EDGAR filing-index fetch (edgar.py:125-202 fetch_index)
    feeding the filings text pipeline (functions/edgar_text.py)."""

    def __init__(self, fetch: Fetcher | None = None):
        self.fetch = fetch or urllib_fetcher()

    def full_index(self, spark: SparkSession, year: int, quarter: int) -> DataFrame:
        return parse_master_idx(spark, self.fetch(edgar_full_index_url(year, quarter)))

    def daily_index(self, spark: SparkSession, date: int) -> DataFrame:
        try:
            raw = self.fetch(edgar_daily_index_url(date, gz=True))
        except Exception:
            raw = self.fetch(edgar_daily_index_url(date, gz=False))
        return parse_master_idx(spark, raw)


# ------------------------------------------------------------------------ FOMC

_FOMC_ROOT = "https://www.federalreserve.gov/"
_MINUTES_HREF = re.compile(r"""href=["']([^"']*minutes[^"']*\.htm)["']""", re.I)
_TAG = re.compile(r"<[^>]+>")
_P_BLOCK = re.compile(r"<p[^>]*>(.*?)</p>", re.I | re.S)


def fomc_minutes_links(payload: bytes, root: str = _FOMC_ROOT) -> dict[int, str]:
    """Extract minutes links from a Fed calendar/historical page and key
    them by meeting date = last 8 digits of the link (fomcreader.py:30-52
    dateOf), regex-only (the environment has no HTML parser dependency)."""
    out: dict[int, str] = {}
    for href in _MINUTES_HREF.findall(payload.decode("utf-8", errors="replace")):
        digits = re.sub(r"\D", "", href)[-8:]
        if len(digits) == 8:
            out[int(digits)] = root + href.lstrip("/")
    return out


def fomc_minutes_text(payload: bytes) -> str:
    """Minutes page -> plain text: join <p> blocks with blank lines, strip
    tags, collapse whitespace (fomcreader.py:66-74)."""
    html = payload.decode("utf-8", errors="replace")
    paras = [_TAG.sub(" ", p).strip() for p in _P_BLOCK.findall(html)]
    text = "\n\n".join(p for p in paras if p)
    return re.sub(r"\n+", "\n", re.sub(r"[\r\t]", " ", text))


class FOMCReader:
    """S16: FOMC minutes scraper feeding the text pipeline
    (fomcreader.py:22-74).  ``dates()`` walks the current calendar page
    plus historical year pages back to ``since``; ``minutes(date)``
    returns the plain text of one meeting's minutes."""

    def __init__(self, fetch: Fetcher | None = None, since: int = 1993):
        self.fetch = fetch or urllib_fetcher()
        self.since = since
        self._links: dict[int, str] | None = None

    def dates(self) -> dict[int, str]:
        if self._links is None:
            links = fomc_minutes_links(
                self.fetch(_FOMC_ROOT + "monetarypolicy/fomccalendars.htm")
            )
            first = min(links) // 10000 if links else self.since
            for year in range(self.since, first):
                links.update(
                    fomc_minutes_links(
                        self.fetch(
                            _FOMC_ROOT + f"monetarypolicy/fomchistorical{year}.htm"
                        )
                    )
                )
            self._links = links
        return self._links

    def minutes(self, date: int) -> str:
        return fomc_minutes_text(self.fetch(self.dates()[date]))

    def minutes_table(self, spark: SparkSession, dates: Iterable[int]) -> DataFrame:
        """Fetch several meetings into a (date, text) documents table —
        the input shape the functions/text.py pipeline expects."""
        rows = [(d, self.minutes(d)) for d in dates]
        return spark.createDataFrame(rows, "date int, text string")


# ----------------------------------------------------------------------- Yahoo

def yahoo_history_url(symbol: str, start: int, end: int) -> str:
    """Daily-history CSV download url (the reference drives the yfinance
    client, real_time.py:54-57; the CSV endpoint is the transport-level
    equivalent with the same column set)."""
    return (
        "https://query1.finance.yahoo.com/v7/finance/download/"
        f"{symbol}?period1={start}&period2={end}&interval=1d&events=history"
    )


class YahooReader:
    """S17: daily price/split/dividend ingest feeding the split
    back-adjustment kernel (real_time.py:58-96).

    The reference back-adjusts with a reversed exclusive cumprod of split
    factors (real_time.py:71-80) — that kernel is
    ``operators.windows.reverse_cumprod`` (oracle-checked as
    ``split_back_adjust``); :meth:`history` lands the raw frame and
    :meth:`adjusted` applies vol/div/price adjustment distributed."""

    def __init__(self, fetch: Fetcher | None = None):
        self.fetch = fetch or urllib_fetcher()

    def history(
        self, spark: SparkSession, symbol: str, start: int = 0, end: int = 9999999999
    ) -> DataFrame:
        raw = self.fetch(yahoo_history_url(symbol, start, end))
        pdf = pd.read_csv(io.BytesIO(raw))
        pdf.columns = [c.lower().replace(" ", "_") for c in pdf.columns]
        pdf["ticker"] = symbol
        out = spark.createDataFrame(pdf)
        return out.select(
            "ticker",
            F.regexp_replace("date", "-", "").cast("int").alias("date"),
            F.col("close").cast("double").alias("close"),
            F.col("volume").cast("double").alias("volume"),
            F.coalesce(F.col("dividends").cast("double"), F.lit(0.0)).alias(
                "dividends"
            ),
            F.coalesce(F.col("stock_splits").cast("double"), F.lit(0.0)).alias(
                "stock_splits"
            ),
        )

    @staticmethod
    def adjusted(raw: DataFrame) -> DataFrame:
        """Split back-adjustment (real_time.py:67-80): factor = reversed
        exclusive cumprod of future split ratios per ticker; vol scales
        down by it, divamt and prc scale up — all window expressions, no
        driver loop."""
        from financial_data_science_spark.operators.windows import reverse_cumprod

        with_factor = reverse_cumprod(
            raw.withColumn(
                "split",
                F.when(F.col("stock_splits") != 0.0, F.col("stock_splits")).otherwise(
                    F.lit(1.0)
                ),
            ),
            "split",
            order="date",
            keys="ticker",
            out="factor",
        )
        return with_factor.select(
            "ticker", "date",
            (F.col("volume") / F.col("factor")).alias("vol"),
            (F.col("dividends") * F.col("factor")).alias("divamt"),
            (F.col("close") * F.col("factor")).alias("prc"),
        )
