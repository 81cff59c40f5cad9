from financial_data_science_spark.datasets.structured import (
    CRSP,
    Benchmarks,
    Signals,
    Stocks,
)
from financial_data_science_spark.datasets.links import (
    get_linked,
    get_permnos,
    prepare_links,
)

__all__ = [
    "CRSP", "Benchmarks", "Signals", "Stocks",
    "get_linked", "get_permnos", "prepare_links",
]
