"""Physical-layout helpers: scan fan-out for under-split inputs.

A parquet file is splittable only at row-group boundaries, so a table
written as one row group scans as ONE task no matter how many cores the
session has — and every map-side operator downstream of that scan
(tokenize/shingle explodes, hash projections, vector folds) serializes
on one core.  That is the guide's "input skew: one huge unsplittable
file" case: repartition immediately after the read.

``fan_out_scan`` is deliberately SCALE-ADAPTIVE, not a constant: the
target is the session's default parallelism (which tracks the master's
core count — the bench driver varies it via $SPARK_GRAFT_CPUS), and the
repartition is a NO-OP whenever the scan already has at least that many
partitions.  At 100 TB a corpus scan arrives in thousands of splits, so
this helper inserts nothing; it only pays one tiny exchange (the raw
rows, pre-explode) when the input is under-split relative to the
session.

Partitioning by an id column (when given) rather than round-robin does
double duty: the rows spread evenly AND the downstream per-id
aggregation's ClusteredDistribution is already satisfied, so the
repartition exchange REPLACES the aggregate's exchange instead of
adding one (guide: two operations keyed the same way share one
exchange).  Only use it on paths whose results are
partitioning-order-independent (min/max/count/integer sums, row-local
projections); a floating-point sum/avg whose accumulation order feeds
an output value must keep its original partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out_scan(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition an under-split scan up to the session's default
    parallelism; no-op on streaming frames and well-split inputs.

    ``keys``: optional column names to hash-partition by (enables
    exchange reuse by a downstream groupBy on the same keys); without
    keys the split is round-robin.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # unconvertible plans: leave layout alone
        return df
    if current >= target:
        return df
    if keys:
        return df.repartition(target, *[F.col(k) for k in keys])
    return df.repartition(target)
