"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator from SURVEY.md §2 as (spark, sf_dir) ->
DataFrame; ``oracle_sql()`` gives the DuckDB-equivalent SQL for the
hash-compare gate.  Implementations live in
financial_data_science_spark/queries.py on top of the operator library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the §3.1 universe-assembly pipeline — prevailing section +
    names join + permco window-sum + screens + NYSE-breakpoint deciles
    fused into one Catalyst DAG (the reference's 5-round-trip entry
    point)."""
    from financial_data_science_spark.queries import Q

    return Q["universe_assembly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from financial_data_science_spark.queries import Q

    return dict(Q)


def oracle_sql() -> dict[str, str]:
    from financial_data_science_spark.queries import ORACLE

    return dict(ORACLE)
