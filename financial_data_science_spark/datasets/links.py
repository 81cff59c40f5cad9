"""Point-in-time link resolution (reference J1/J2: structured.py:230-328).

``get_linked`` is the reference's signature operator: attach the security
identifier (lpermno) prevailing at each data row's date, where links carry
(linkdt, linkenddt) validity with 0 = open.  The reference runs a
correlated MAX-subquery per row in MySQL (pstat.py:416-428); here it is
one as-of join (union-ffill at scale, broadcast-join for small link dims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_science_spark.operators import asof_join

VALID_LINKTYPES = ["LC", "LU"]  # pstat.py screen


def prepare_links(links: DataFrame, linktypes: list[str] | None = None) -> DataFrame:
    """Normalize the links table: screen linktypes, open-start linkdt=0
    stays 0 (sorts before any real date), keep positive lpermno rows."""
    lt = linktypes or VALID_LINKTYPES
    return links.filter(
        F.col("linktype").isin(lt) & (F.col("lpermno") > 0)
    ).select("gvkey", "linkdt", "linkenddt", "lpermno")


def get_linked(
    data: DataFrame,
    links: DataFrame,
    date_field: str = "datadate",
    key: str = "gvkey",
    strategy: str = "join",
    enforce_end: bool = True,
) -> DataFrame:
    """J1: attach prevailing lpermno to each data row.

    Prevailing = link with max(linkdt) <= date (linkdt=0 matches always),
    and, when ``enforce_end``, linkenddt >= date or 0 (the reference's
    get_linked applies the end-date bound in SQL structured.py:297-303).
    Links are a small dimension -> broadcast 'join' strategy by default;
    pass 'union' when links rival the fact table in size.
    """
    lk = prepare_links(links)
    out = asof_join(
        data, lk, by=key, left_on=date_field, right_on="linkdt",
        strategy=strategy, right_tiebreak="lpermno",
    )
    if enforce_end:
        out = out.withColumn(
            "lpermno",
            F.when(
                (F.col("linkenddt") == 0)
                | (F.col("linkenddt") >= F.col(date_field)),
                F.col("lpermno"),
            ),
        )
    return out.drop("linkenddt")


def get_permnos(
    keys: DataFrame, links: DataFrame, date: int, key: str = "gvkey"
) -> DataFrame:
    """J2: lpermno prevailing at one fixed date for a key list
    (structured.py:230-272); missing -> 0 (reference fillna(0))."""
    with_date = keys.withColumn("__d__", F.lit(date))
    out = get_linked(with_date, links, date_field="__d__", key=key)
    return out.drop("__d__").fillna({"lpermno": 0})


def build_ibes_links(
    idents: DataFrame,
    names: DataFrame,
) -> DataFrame:
    """IBES ticker -> CRSP permno bridge (reference ibes.py:131-158
    write_links): each ident row (ticker, sdates, cusip, cname) picks the
    CRSP names row with the same 8-char cusip and the max name-date <=
    sdates.  The reference runs a correlated MAX subquery per row in
    MySQL; here it is ONE as-of join keyed on cusip (union-ffill shape —
    no per-row probing, linear in rows at any scale).  Unmatched idents
    keep null permno (LEFT JOIN semantics).
    """
    nm = names.select(
        F.col("ncusip").alias("cusip"),
        F.col("date"),
        F.col("date").alias("namedate"),  # as-of drops the time key; keep a copy
        "comnam",
        "permno",
    )
    return asof_join(
        idents, nm, by="cusip", left_on="sdates", right_on="date",
        right_tiebreak="permno",
    ).select(
        "ticker", "sdates", "permno",
        F.col("namedate").alias("date"), "comnam", "cname", "cusip",
    )


def ibes_get_permnos(
    links: DataFrame, tickers: DataFrame, date: int
) -> DataFrame:
    """Prevailing permno for a ticker list at one date (ibes.py:142-158
    get_permnos): link row with max sdates <= date per ticker; missing ->
    0 (reference fillna(0))."""
    with_date = tickers.withColumn("__d__", F.lit(date))
    out = asof_join(
        with_date, links.select("ticker", "sdates", "permno"),
        by="ticker", left_on="__d__", right_on="sdates",
        right_tiebreak="permno",
    )
    return out.drop("__d__").fillna({"permno": 0})
