from financial_data_science_spark.backtesting.backtest import (
    bivariate_sorts,
    performance_attribution,
    portfolio_returns,
    smooth_holdings,
    turnover,
    univariate_sorts,
)
from financial_data_science_spark.backtesting.eventstudy import (
    abnormal_returns,
    car_bhar,
    event_study,
    portfolio_stats,
)

__all__ = [
    "bivariate_sorts", "performance_attribution",
    "portfolio_returns", "smooth_holdings", "turnover", "univariate_sorts",
    "abnormal_returns", "car_bhar", "event_study", "portfolio_stats",
]
