"""Time-binned tick aggregation (reference A11/A12, P7/P8, §2.9).

Reference semantics:
  - ``TAQ.bin_trades`` readers/taq.py:494-602: per 5-minute bin per symbol —
    volume sum, trade count, first/last/max/min price, vwap.
  - ``TAQ.bin_quotes`` readers/taq.py:417-491: forward-duration time-weighted
    quoted spread/mid/depth per bin.
  - trade/quote cleaning readers/taq.py:293-380 (P7/P8).

Spark realization: ``groupBy(window(ts, width))`` tumbling windows — hash
aggregate with map-side combine; the same expression set runs under
Structured Streaming with a watermark (streaming/windows.py).  Bin label is
the window *end* (reference uses closed='left', label='right',
taq.py:449-453).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Sale conditions excluded from clean trades (taq.py:310-318).
EXCLUDED_TRADE_CONDS = "MOZBTLGWJK145789"


def bin_aggregate(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str] | str | None = None,
    aggs: dict[str, Column] | None = None,
    label: str = "right",
) -> DataFrame:
    """Tumbling-window aggregate: groupBy(window(ts, width), *keys).agg(...).

    ``aggs`` maps output column name -> aggregate expression.  Output has
    ``bin`` (window end when label='right', else start) + keys + aggs.
    """
    keys = [keys] if isinstance(keys, str) else list(keys or [])
    aggs = aggs or {"n": F.count(F.lit(1))}
    win = F.window(F.col(ts_col), width)
    g = df.groupBy(win.alias("__w__"), *keys)
    out = g.agg(*[expr.alias(name) for name, expr in aggs.items()])
    edge = "end" if label == "right" else "start"
    return out.withColumn("bin", F.col(f"__w__.{edge}")).drop("__w__").select(
        "bin", *keys, *aggs.keys()
    )


def trade_aggs(price: str = "price", volume: str = "volume") -> dict[str, Column]:
    """The bin_trades aggregate set (taq.py:534-560) as named expressions."""
    p, v = F.col(price), F.col(volume)
    return {
        "n_trades": F.count(p),
        "volume": F.sum(v),
        "first_price": F.min_by(p, F.col("__ord__")),
        "last_price": F.max_by(p, F.col("__ord__")),
        "max_price": F.max(p),
        "min_price": F.min(p),
        "vwap": F.try_divide(F.sum(p * v), F.sum(v)),  # zero-volume bin -> NULL
    }


def bin_trades(
    trades: DataFrame,
    ts_col: str = "time",
    symbol_col: str = "symbol",
    price_col: str = "price",
    volume_col: str = "volume",
    width: str = "5 minutes",
    seq_col: str | None = None,
) -> DataFrame:
    """Per-symbol 5-minute trade bins (A11)."""
    ordc = F.struct(
        F.col(ts_col), *( [F.col(seq_col)] if seq_col else [] )
    )
    df = trades.withColumn("__ord__", ordc)
    out = bin_aggregate(
        df, ts_col, width, keys=[symbol_col], aggs=trade_aggs(price_col, volume_col)
    )
    return out


def clean_trades(
    trades: DataFrame,
    price_col: str = "price",
    volume_col: str = "volume",
    corr_col: str = "corr",
    cond_col: str = "cond",
    excluded_conds: str = EXCLUDED_TRADE_CONDS,
) -> DataFrame:
    """P7 trade filter: corr==0, price>0, vol>0, no excluded sale condition."""
    bad = f"[{excluded_conds}]"
    return trades.filter(
        (F.col(corr_col) == 0)
        & (F.col(price_col) > 0)
        & (F.col(volume_col) > 0)
        & (~F.coalesce(F.col(cond_col), F.lit("")).rlike(bad))
    )


def clean_quotes(
    quotes: DataFrame,
    bid: str = "bid",
    ask: str = "ask",
    bidsiz: str = "bidsiz",
    asksiz: str = "asksiz",
    cancel: str = "cancel",
    max_spread: float = 5.0,
) -> DataFrame:
    """P8 quote filter: positive sizes/prices, ask>bid, spread<=max, not cancelled."""
    return quotes.filter(
        (F.col(bid) > 0)
        & (F.col(ask) > F.col(bid))
        & ((F.col(ask) - F.col(bid)) <= max_spread)
        & (F.col(bidsiz) > 0)
        & (F.col(asksiz) > 0)
        & (F.coalesce(F.col(cancel), F.lit("")) != "B")
    )


def time_weighted_quote_aggs(
    ts_col: str, bid: str = "bid", ask: str = "ask", weight_col: str = "__dur__"
) -> dict[str, Column]:
    """A12 aggregate set: forward-duration weighted spread/mid (taq.py:460-491).

    Requires a precomputed forward-duration column (seconds to next quote,
    from ``F.lead(ts) - ts`` over a per-symbol window).
    """
    w = F.col(weight_col)
    spread = F.col(ask) - F.col(bid)
    mid = (F.col(ask) + F.col(bid)) / 2
    def wavg(x: Column) -> Column:
        # try_divide: an all-zero-duration bin (every tick at the same
        # timestamp) must yield NULL, not an ANSI DIVIDE_BY_ZERO
        return F.try_divide(F.sum(x * w), F.sum(F.when(x.isNotNull(), w)))
    return {
        "n_quotes": F.count(F.lit(1)),
        "tw_spread": wavg(spread),
        "tw_mid": wavg(mid),
        "first_mid": F.min_by(mid, F.col(ts_col)),
        "last_mid": F.max_by(mid, F.col(ts_col)),
        "max_mid": F.max(mid),
        "min_mid": F.min(mid),
    }
