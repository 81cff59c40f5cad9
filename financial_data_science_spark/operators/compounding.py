"""Groupwise return compounding (reference A2/A3/A4/A14, J11).

Reference semantics:
  - ``Stocks.get_ret`` structured/stocks.py:102-145 —
    ``(1+ret).groupby(permno).prod(min_count=1) - 1``: the product of
    non-null gross returns, but NULL (not 1.0) when a group has *no*
    non-null return.
  - interval list compounding ``compound_ret`` backtesting/backtest.py:31-41,
    ``get_compounded`` structured/stocks.py:147-167 (A4).
  - delisting-return merge crsp.py:283-323, 350-357 (A3/J11): missing dlret
    with delist code in {500, 520, 551..574, 580, 584} defaults to -0.3;
    monthly total return = (1+ret)(1+dlret)-1 with null->0.

Spark realization: ``F.product`` aggregate guarded by a non-null count —
a single hash aggregate with map-side partial combine (no window, no sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Delisting codes whose missing dlret defaults to -0.3 (crsp.py:300-310).
DELIST_DEFAULT_CODES = [500, 520, 580, 584] + list(range(551, 575))


def compounded(ret: str | Column, alias: str = "ret") -> Column:
    """Aggregate expression: product(1+ret)-1 with min_count=1 semantics."""
    c = F.col(ret) if isinstance(ret, str) else ret
    prod = F.product(F.lit(1.0) + c) - F.lit(1.0)
    return F.when(F.count(c) > 0, prod).alias(alias)


def compound_returns(
    df: DataFrame,
    keys: list[str] | str,
    ret_col: str = "ret",
    beg: int | None = None,
    end: int | None = None,
    date_col: str = "date",
    alias: str = "ret",
) -> DataFrame:
    """Compounded return per key over [beg, end] (A2).

    One scan -> pushed-down date filter -> hash agg.  ``min_count=1``:
    groups whose returns are all null yield null, groups with no rows in
    range are absent (matching the reference's inner groupby).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if beg is not None:
        df = df.filter(F.col(date_col) >= F.lit(beg))
    if end is not None:
        df = df.filter(F.col(date_col) <= F.lit(end))
    return df.groupBy(*keys).agg(compounded(ret_col, alias))


def compound_intervals(
    df: DataFrame,
    intervals: DataFrame,
    keys: list[str] | str,
    ret_col: str = "ret",
    date_col: str = "date",
    beg_col: str = "beg",
    end_col: str = "end",
    alias: str = "ret",
) -> DataFrame:
    """Compound within each (beg, end] interval of ``intervals`` (A4).

    ``intervals`` is a small holding-period table (rebalance dates) —
    broadcast it; the fact table is range-joined once and hash-aggregated,
    replacing the reference's per-interval SQL loop
    (structured/stocks.py:169-199).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    j = df.join(
        F.broadcast(intervals),
        (F.col(date_col) > F.col(beg_col)) & (F.col(date_col) <= F.col(end_col)),
        "inner",
    )
    return j.groupBy(beg_col, end_col, *keys).agg(compounded(ret_col, alias))


def delist_adjusted_ret(
    ret: Column | str = "ret",
    dlret: Column | str = "dlret",
    dlstcd: Column | str = "dlstcd",
) -> Column:
    """Total return combining ordinary and delisting returns (A3/J11).

    Missing dlret with code in DELIST_DEFAULT_CODES -> -0.3 (crsp.py:300-310);
    then (1+ret)(1+dlret)-1 with null treated as 0 on either side
    (crsp.py:350-357).
    """
    r = F.col(ret) if isinstance(ret, str) else ret
    d = F.col(dlret) if isinstance(dlret, str) else dlret
    code = F.col(dlstcd) if isinstance(dlstcd, str) else dlstcd
    d = F.when(d.isNull() & code.isin(DELIST_DEFAULT_CODES), F.lit(-0.3)).otherwise(d)
    return (F.lit(1.0) + F.coalesce(r, F.lit(0.0))) * (
        F.lit(1.0) + F.coalesce(d, F.lit(0.0))
    ) - F.lit(1.0)
