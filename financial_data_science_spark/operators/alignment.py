"""Trade-quote event-time alignment (reference W8: readers/taq.py:383-414).

``align_trades``: for each trade, the prevailing NBBO midquote as of
(t - epsilon) and the midquote as of (t + horizon) — Lee-Ready style
effective/realized spread inputs.  Physical shape: the union-ffill as-of
join per symbol (one shuffle per side), NOT a per-symbol pandas loop; the
forward alignment reuses the backward machinery on a shifted key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_science_spark.operators.asof import asof_join


def align_trades(
    trades: DataFrame,
    quotes: DataFrame,
    symbol_col: str = "symbol",
    trade_ts: str = "time",
    quote_ts: str = "time",
    bid: str = "bid",
    ask: str = "ask",
    horizon_seconds: float = 300.0,
) -> DataFrame:
    """Attach ``prev_mid`` (prevailing quote strictly before the trade,
    taq.py:406-408 reindexes at t-1ns) and ``fwd_mid`` (prevailing quote at
    t + horizon, taq.py:409-411) to each trade row."""
    mids = quotes.select(
        symbol_col,
        F.col(quote_ts).alias("__qt__"),
        ((F.col(bid) + F.col(ask)) / 2).alias("prev_mid"),
    )
    out = asof_join(
        trades, mids, by=symbol_col, left_on=trade_ts, right_on="__qt__",
        allow_exact_matches=False,  # quote strictly before the trade
        right_tiebreak="prev_mid",
    )
    fwd_key = (F.col(trade_ts).cast("double") + F.lit(horizon_seconds)).alias(
        "__fwd_t__"
    )
    shifted = out.withColumn("__fwd_t__", fwd_key)
    mids_fwd = mids.select(
        symbol_col,
        F.col("__qt__").cast("double").alias("__qtd__"),
        F.col("prev_mid").alias("fwd_mid"),
    )
    out2 = asof_join(
        shifted, mids_fwd, by=symbol_col, left_on="__fwd_t__", right_on="__qtd__",
        right_tiebreak="fwd_mid",
    )
    return out2.drop("__fwd_t__")


def tick_sign(price_col: str = "price", ts_col: str = "time",
              symbol_col: str = "symbol") -> Column:
    """Lee-Ready tick test (taq.py:412-413): +1 uptick, -1 downtick, carry
    previous sign on zero ticks — lag + sign + last-non-zero ffill."""
    from pyspark.sql import Window

    w = Window.partitionBy(symbol_col).orderBy(ts_col)
    diff = F.signum(F.col(price_col) - F.lag(price_col).over(w))
    carried = F.last(
        F.when(diff != 0, diff), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return carried
