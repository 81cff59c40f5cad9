"""On-arrival approximate-nearest-neighbor search (§2.9 x ANN).

The ingestion-time shape of similarity search: an offline leg builds an
IVF index over the existing corpus (``similarity.ivf_build_index`` —
Lloyd training, corpus binning, persisted through the Store), and the
ARRIVAL stream is matched against it inside one streaming DAG — each
new vector tagged with its nearest existing neighbor as it lands.

Why this composes in a stream at all: the IVF coarse probe is a pure
per-row projection (``similarity._probe_clusters`` scores the inlined
centroid literal with an array_sort/slice/explode — no window, no
aggregate), the candidate fetch is a stream-static join onto the binned
corpus restricted to the probed lists (stateless, broadcast-able: the
probed lists are a corpus fraction ~nprobe/nlist), and the only
stateful operator is the per-arrival argmax, grouped on the arrival's
OWN event-time window so each group is one arrival.

Output modes (the scaling boundary, measured in SCALE.md):

- ``watermark=None`` -> COMPLETE mode: every per-arrival argmax is
  re-emitted each micro-batch.  Exact and convenient for bounded
  backfills and the memory-sink gate, but re-emission work grows with
  ACCUMULATED arrivals — quadratic over an unbounded stream (measured
  bog-down by epoch ~6 of 8 at 20k arrivals).
- ``watermark="0 seconds"`` (or any horizon) -> APPEND mode: each
  argmax emits exactly ONCE when the watermark passes its window end,
  and its state row is evicted — per-epoch cost stays flat in arrivals
  per epoch, the indefinite-ingestion deployment shape.  The price is
  the horizon itself: an arrival's match emits only after a LATER
  arrival advances the watermark past it (continuous streams do this
  for free; a drained backfill leaves its final in-horizon windows
  unemitted).

Reference parity: the reference has no streaming engine — its
nearest-neighbor flows are batch loops (finds/recipes similarity
sections); this module is the Spark-native arrival-time twin of the
same IVF quantizer chain, oracle-checked against the identical
deterministic replay (queries._ivf_oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def on_arrival_nearest(
    stream: DataFrame,
    index: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    nprobe: int = 2,
    window: str = "1 second",
    watermark: str | None = None,
    query_id: str = "query_id",
) -> DataFrame:
    """Match each arriving vector against a pre-built IVF ``index``
    (the dict from ``similarity.ivf_build_index``) and emit its top-1
    in-list cosine neighbor, keyed by the arrival's event-time window.

    ``watermark=None`` -> run the result in complete mode (bounded
    query sets / gate harness); a watermark string -> append mode with
    once-per-arrival emission and state eviction (production; see
    module docstring for the emission-horizon contract).  Ties break to
    the lowest neighbor id on the 6dp-rounded score — the same
    round-before-rank discipline as the batch IVF top-k."""
    from financial_data_science_spark.functions.similarity import (
        _probe_clusters,
        dot,
        norm,
    )

    binned = index["binned"].withColumn("__cn__", norm(F.col(vec_col)))
    probes = _probe_clusters(
        stream, id_col, vec_col, index["centroids"], nprobe, query_id,
        keep=(ts_col,),
    ).withColumn("__qn__", norm(F.col("__qv__")))
    scored = (
        probes.join(binned, "cluster")
        .filter(F.col(query_id) != F.col(id_col))
        .select(
            query_id,
            ts_col,
            F.col(id_col).alias("neighbor_id"),
            F.round(
                dot(F.col("__qv__"), F.col(vec_col))
                / (F.col("__qn__") * F.col("__cn__")),
                6,
            ).alias("__s__"),
        )
    )
    if watermark is not None:
        scored = scored.withWatermark(ts_col, watermark)
    return (
        scored.groupBy(F.window(ts_col, window), query_id)
        .agg(
            F.max(
                F.struct(
                    F.col("__s__").alias("s"),
                    (-F.col("neighbor_id")).alias("negid"),
                )
            ).alias("m")
        )
        .select(
            query_id,
            (-F.col("m.negid")).alias("neighbor_id"),
            F.round("m.s", 4).alias("score"),
        )
    )
