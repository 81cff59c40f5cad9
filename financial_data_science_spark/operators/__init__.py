from financial_data_science_spark.operators.asof import asof_join
from financial_data_science_spark.operators.prevailing import keep_extremum, prevailing
from financial_data_science_spark.operators.compounding import (
    compound_intervals,
    compound_returns,
    compounded,
    delist_adjusted_ret,
)
from financial_data_science_spark.operators.fractiles import (
    breakpoints,
    bucket_expr,
    fractile_split,
    winsorize,
)
from financial_data_science_spark.operators.windows import (
    cumcount,
    drop_unchanged,
    ffill,
    islands,
    reverse_cumprod,
    running,
    sessionize,
)
from financial_data_science_spark.operators.events import event_range_agg, event_window
from financial_data_science_spark.operators.binning import (
    bin_aggregate,
    bin_trades,
    clean_quotes,
    clean_trades,
)
from financial_data_science_spark.operators.alignment import align_trades, tick_sign
from financial_data_science_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
    write_bucketed,
)

__all__ = [
    "asof_join", "keep_extremum", "prevailing",
    "compound_intervals", "compound_returns", "compounded", "delist_adjusted_ret",
    "breakpoints", "bucket_expr", "fractile_split", "winsorize",
    "cumcount", "drop_unchanged", "ffill", "islands", "reverse_cumprod",
    "running", "sessionize",
    "event_range_agg", "event_window",
    "bin_aggregate", "bin_trades", "clean_quotes", "clean_trades",
    "align_trades", "tick_sign",
    "salted_aggregate", "salted_broadcast_join", "write_bucketed",
]
