"""Offline transform kernels for the external-source readers (SURVEY §2.1).

The reference's readers mix network fetch with data transforms.  The fetch
is driver-side I/O in any engine; what belongs in the engine — and is
implemented here — is the transform applied to the fetched frame:

  - ``ff_scale``: Fama-French library post-processing (readers/ffreader.py:
    158-181): sentinel -99.99/-999 -> null, percent -> decimal.
  - ``regroup_codes``: BEA IO-Use table regroup (readers/bea.py:430-453,
    A15): collapse row & column codes onto a coarser sector scheme via a
    broadcast code->sector map and re-aggregate.

Network readers themselves (ALFRED/BEA/EDGAR/FOMC/Yahoo) reduce to:
driver-side fetch -> ``spark.createDataFrame`` -> these kernels -> bronze
parquet; the vintage-selection logic lives in sources/vintages.py and the
text pipeline in functions/edgar_text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ff_scale(
    col: str | Column,
    sentinels: tuple[float, ...] = (-99.99, -999.0),
    percent: bool = True,
) -> Column:
    """Fama-French value cleaning: sentinel missing codes -> null, then
    percent -> decimal (ffreader.py:166-171)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.when(~c.isin(*[F.lit(s) for s in sentinels]), c)
    return cleaned / 100.0 if percent else cleaned


def regroup_codes(
    df: DataFrame,
    mapping: DataFrame,
    code_cols: list[str],
    value_col: str = "datavalue",
    map_code: str = "code",
    map_group: str = "sector",
) -> DataFrame:
    """Collapse each code dimension onto its mapped group and re-aggregate
    the value (bea.py:430-453).  ``mapping`` is a small dimension —
    broadcast per code column, so the fact table never shuffles for the
    lookups, only once for the final re-aggregation."""
    out = df
    group_cols = []
    for c in code_cols:
        m = F.broadcast(
            mapping.select(
                F.col(map_code).alias(c), F.col(map_group).alias(f"{c}_group")
            )
        )
        out = out.join(m, c, "left")
        group_cols.append(f"{c}_group")
    return out.groupBy(*group_cols).agg(F.sum(value_col).alias(value_col))
