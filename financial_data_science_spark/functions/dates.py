"""Int-date (YYYYMMDD) column helpers.

The reference speaks int dates everywhere (``beg=19000000, end=29001231``
structured/stocks.py:38-39; coercion database/sql.py:57-59).  These helpers
keep that convention at the API boundary while converting to Spark date
types for calendar arithmetic (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def int_to_date(col: str | Column) -> Column:
    """YYYYMMDD int -> DateType."""
    return F.to_date(_c(col).cast("string"), "yyyyMMdd")


def date_to_int(col: str | Column) -> Column:
    """DateType/TimestampType -> YYYYMMDD int."""
    return F.date_format(_c(col), "yyyyMMdd").cast("int")


def year(col: str | Column) -> Column:
    return (_c(col) / 10000).cast("int")


def month(col: str | Column) -> Column:
    return ((_c(col) % 10000) / 100).cast("int")


def day(col: str | Column) -> Column:
    return (_c(col) % 100).cast("int")


def month_key(col: str | Column) -> Column:
    """YYYYMM int — monthly rollup key (A14, real_time.py:200-208)."""
    return (_c(col) / 100).cast("int")


def to_monthend(col: str | Column) -> Column:
    """Calendar month-end as YYYYMMDD int (busday.py:288-400 to_monthend)."""
    return date_to_int(F.last_day(int_to_date(col)))
