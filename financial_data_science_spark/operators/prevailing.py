"""Prevailing-row selection and keyed dedup (reference J7/W1/W2).

Reference semantics:
  - ``Stocks.get_section`` structured/stocks.py:354-407 — groupwise-latest
    self-join: the prevailing row per key with date <= asof (and > start).
  - sorted ``drop_duplicates(keep='first'|'last')`` database/sql.py:49-52,
    structured/structured.py:111-114, structured/signals.py:92-93.

Spark realization: a single window ``row_number`` (one shuffle on the keys)
or ``max_by(struct(*), order)`` — never a self-join against a groupwise-max
subquery, which would scan the fact table twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_extremum(
    df: DataFrame,
    keys: list[str] | str,
    order: list[str] | str,
    keep: str = "last",
) -> DataFrame:
    """Dedup to one row per key group: first/last after sorting by ``order``.

    Equivalent of ``sort_values(order).drop_duplicates(keys, keep=keep)``
    (database/sql.py:49-52).  Deterministic given a total ``order`` within
    each key group.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [order] if isinstance(order, str) else list(order)
    cols = [F.col(c).desc() for c in order] if keep == "last" else [F.col(c).asc() for c in order]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def prevailing(
    df: DataFrame,
    keys: list[str] | str,
    date_col: str,
    asof: int | str | Column | None = None,
    start: int | str | Column | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Latest row per key with ``start < date_col <= asof``.

    Mirrors ``get_section(..., date_field, date, start)``
    (structured/stocks.py:354-407) and the prevailing-signal lookup
    (structured/signals.py:28-45) as one filter + one window — Catalyst
    pushes the date filter to the scan, then a single shuffle on ``keys``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if asof is not None:
        df = df.filter(F.col(date_col) <= F.lit(asof))
    if start is not None:
        df = df.filter(F.col(date_col) > F.lit(start))
    order = [date_col] + (tiebreak or [])
    return keep_extremum(df, keys, order, keep="last")
