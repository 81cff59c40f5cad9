"""Mongo-style predicate parsing + identifier search (reference P5/P6).

Reference: finds/database/mongodb.py:11-48 ``parse_where`` — dict keys
carry operator suffixes (``field_eq``, ``field_gt``, ``field_in``...),
tuples mean closed intervals, a bare string means field-exists; and
finds/utils/finder.py:62-104 — identifier lookup that guesses the id type
from its shape and falls back to LIKE name search.

Spark realization: compile the dict straight to a ``Column`` predicate —
Catalyst then pushes the conjuncts into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "lt": lambda c, v: c < v,
    "le": lambda c, v: c <= v,
    "gt": lambda c, v: c > v,
    "ge": lambda c, v: c >= v,
    "in": lambda c, v: c.isin(list(v)),
    "notin": lambda c, v: ~c.isin(list(v)),
}


def parse_where(where: dict | str | None) -> Column:
    """Compile a reference-style where spec to one Column predicate (P5).

    ``{'permno_eq': 10001, 'date_ge': 20230101, 'shrcd_in': [10, 11],
    'prc': (1, 100)}``; a tuple value is a closed interval; key without a
    recognized suffix and non-dict value means equality; a bare string
    argument means the field is non-null."""
    if where is None:
        return F.lit(True)
    if isinstance(where, str):
        return F.col(where).isNotNull()
    pred = F.lit(True)
    for key, val in where.items():
        field, _, suffix = key.rpartition("_")
        if field and suffix in _OPS:
            clause = _OPS[suffix](F.col(field), val)
        elif isinstance(val, tuple) and len(val) == 2:
            clause = F.col(key).between(val[0], val[1])
        else:
            clause = F.col(key) == val
        pred = pred & clause
    return pred


def where(df: DataFrame, spec: dict | str | None) -> DataFrame:
    return df.filter(parse_where(spec))


def guess_id_column(value: str | int) -> str:
    """P6 id-shape dispatch (finder.py:62-104): 5-6 digits -> permno,
    8-9 alnum -> cusip, 1-5 alpha -> ticker, else name search."""
    s = str(value)
    if s.isdigit() and 5 <= len(s) <= 6:
        return "permno"
    if len(s) in (8, 9) and s.isalnum() and not s.isalpha():
        return "cusip"
    if s.isalpha() and len(s) <= 5:
        return "ticker"
    return "comnam"


def find_identifier(names: DataFrame, value: str | int) -> DataFrame:
    """Identifier search with LIKE fallback on company name (P6)."""
    col = guess_id_column(value)
    if col == "comnam":
        return names.filter(F.upper(F.col("comnam")).like(f"%{str(value).upper()}%"))
    if col == "ticker":
        return names.filter(F.col("ticker") == str(value).upper())
    return names.filter(F.col(col) == value)
