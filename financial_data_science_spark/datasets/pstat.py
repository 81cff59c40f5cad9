"""PSTAT (Compustat/CIQ) dataset facade (reference structured/pstat.py).

The reference wraps three surfaces the repo's generic layers don't name:
KeyDev role/event id->label maps (pstat.py:36-216), the screened links
table (pstat.py:230-272), and `get_linked` point-in-time identifier
resolution (pstat.py:416-428).  Spark-first shape: label maps are tiny
broadcast dimensions (attach = broadcast hash join, zero shuffle on the
fact side); link resolution delegates to the as-of operator.

The role map below is the reference's complete 12-entry table; the event
map ships a representative subset of the CIQ KeyDev taxonomy — the full
several-hundred-row mapping is site data, pass it via ``event_map`` (any
dict) rather than hard-coding a vendor list here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_science_spark.datasets.links import get_linked, get_permnos

#: KeyDev role id -> label (pstat.py:41-54, complete)
KEYDEV_ROLES: dict[int, str] = {
    1: "Target", 2: "Advisor", 3: "Buyer", 4: "Seller", 5: "Transaction",
    6: "Transaction Consideration", 7: "Lender", 8: "Participant",
    9: "TradingItemId", 10: "Auditor", 11: "Sponsor", 14: "Host",
}

#: KeyDev event id -> label (pstat.py:56-216, representative subset; the
#: full vendor taxonomy is configuration, not code)
KEYDEV_EVENTS: dict[int, str] = {
    1: "Seeking to Sell/Divest",
    3: "Seeking Acquisitions/Investments",
    7: "Bankruptcy - Other",
    12: "Delistings",
    16: "Executive/Board Changes - Other",
    22: "Strategic Alliances",
    25: "Lawsuits & Legal Issues",
    26: "Corporate Guidance - Lowered",
    27: "Corporate Guidance - Raised",
    28: "Announcements of Earnings",
    31: "Business Expansions",
    36: "Buybacks",
    46: "Dividend Increases",
    47: "Dividend Decreases",
    53: "Stock Splits & Significant Stock Dividends",
    56: "Name Changes",
    57: "Exchange Changes",
    58: "Ticker Changes",
    65: "M&A Rumors and Discussions",
    73: "Impairments/Write Offs",
    74: "Debt Defaults",
    80: "M&A Transaction Announcements",
    83: "Private Placements",
    85: "IPOs",
    86: "Follow-on Equity Offerings",
    101: "Executive Changes - CEO",
    102: "Executive Changes - CFO",
}


class PSTAT:
    """KeyDev labeling + point-in-time link resolution facade."""

    def __init__(
        self,
        spark: SparkSession,
        links: DataFrame | None = None,
        role_map: dict[int, str] | None = None,
        event_map: dict[int, str] | None = None,
    ):
        self.spark = spark
        self.links = links
        self.role_map = role_map or KEYDEV_ROLES
        self.event_map = event_map or KEYDEV_EVENTS

    def _dim(self, mapping: dict[int, str], id_col: str, label_col: str):
        return F.broadcast(
            self.spark.createDataFrame(
                list(mapping.items()), f"{id_col} int, {label_col} string"
            )
        )

    def label_keydev(
        self,
        df: DataFrame,
        event_col: str = "keydeveventtypeid",
        role_col: str = "keydevtoobjectroletypeid",
        default: str = "Other",
    ) -> DataFrame:
        """Attach event/role labels via broadcast dimension joins — the
        Spark shape of the reference's Series.map (pstat.py:218-226);
        unknown ids get ``default`` (the reference leaves NaN)."""
        ev = self._dim(self.event_map, event_col, "event_label")
        out = df.join(ev, event_col, "left").withColumn(
            "event_label", F.coalesce("event_label", F.lit(default))
        )
        if role_col in df.columns:
            rl = self._dim(self.role_map, role_col, "role_label")
            out = out.join(rl, role_col, "left").withColumn(
                "role_label", F.coalesce("role_label", F.lit(default))
            )
        return out

    def get_linked(self, data: DataFrame, date_field: str = "datadate", **kw) -> DataFrame:
        """Prevailing lpermno per data row (pstat.py:416-428) — delegates
        to the as-of link operator on the screened links table."""
        if self.links is None:
            raise ValueError("PSTAT facade requires a links table")
        return get_linked(data, self.links, date_field=date_field, **kw)

    def get_permnos(self, keys: DataFrame, date: int, **kw) -> DataFrame:
        if self.links is None:
            raise ValueError("PSTAT facade requires a links table")
        return get_permnos(keys, self.links, date, **kw)
