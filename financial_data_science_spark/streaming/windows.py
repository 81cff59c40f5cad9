"""Structured Streaming counterparts of the batch tick/event operators
(SURVEY §2.9).

The reference's TAQ pipeline is a stream in disguise (per-symbol
time-ordered iteration readers/taq.py:173-204; 5-minute binning
taq.py:449-453; keep-last dedup taq.py:377-378).  Here the *same aggregate
expressions* used by operators/binning.py run under ``readStream`` with a
watermark, so batch/stream parity is a test, not a hope.
"""

from __future__ import annotations

import atexit

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def stream_bin_aggregate(
    stream: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str] | str | None = None,
    aggs: dict[str, Column] | None = None,
    watermark: str = "10 minutes",
    label: str = "right",
) -> DataFrame:
    """Streaming tumbling-window aggregate with late-data watermark.

    Same output schema as ``operators.binning.bin_aggregate`` so results
    can be compared row-for-row in parity tests.
    """
    keys = [keys] if isinstance(keys, str) else list(keys or [])
    aggs = aggs or {"n": F.count(F.lit(1))}
    win = F.window(F.col(ts_col), width)
    g = stream.withWatermark(ts_col, watermark).groupBy(win.alias("__w__"), *keys)
    out = g.agg(*[expr.alias(name) for name, expr in aggs.items()])
    edge = "end" if label == "right" else "start"
    return (
        out.withColumn("bin", F.col(f"__w__.{edge}"))
        .drop("__w__")
        .select("bin", *keys, *aggs.keys())
    )


def stream_dedup(
    stream: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Keep-first-per-key within the watermark (taq.py:377-378 analogue)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def stream_session_counts(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | str,
    watermark: str | None = "30 minutes",
) -> DataFrame:
    """Session-window event counts (``F.session_window``), the streaming
    analogue of operators/windows.py::sessionize (alfred.py:244-259 A13).

    With a watermark, run in append mode (sessions emit once closed); with
    ``watermark=None``, run in complete/update mode (state kept forever —
    test/backfill only).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream
        .groupBy(F.session_window(F.col(ts_col), gap).alias("__s__"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("__s__.start").alias("session_start"),
            F.col("__s__.end").alias("session_end"),
            *keys,
            "n",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    result: DataFrame,
    name: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drive a streaming query to completion over a static source
    (Trigger.AvailableNow semantics via processAllAvailable) and return the
    materialized result — the harness for batch-parity tests."""
    q = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def read_events_stream(
    spark: SparkSession, sf_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """readStream over the driver's events parquet (one file => one batch).

    Schema must be supplied for streaming reads; defaults to the events
    table shape with the naive parquet timestamp[us] ts read as NTZ then
    cast to session-TZ TimestampType (UTC session => same wall clock,
    matching the batch loader in sources/testdata.py).
    """
    import os

    if schema is None:
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampNTZType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
    # streaming file source requires a directory; glob-filter to the one table
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def read_documents_stream(
    spark: SparkSession, sf_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """readStream over the documents parquet with a synthetic
    deterministic event time (``ts = epoch2020 + doc_id seconds``) — the
    ingestion-order clock a streaming curation pipeline needs for
    watermarked dedup state; documents have no native timestamp."""
    if schema is None:
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    return raw.withColumn(
        "ts", F.timestamp_seconds(F.lit(1577836800) + F.col("doc_id"))
    )


def read_embeddings_stream(
    spark: SparkSession, sf_dir: str, schema: T.StructType | None = None
) -> DataFrame:
    """readStream over the embeddings parquet with the same synthetic
    deterministic event time as the documents stream (``ts = epoch2020
    + vec_id seconds``) — the arrival clock for on-arrival similarity
    search."""
    if schema is None:
        schema = T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("label", T.IntegerType()),
            ]
        )
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )
    return raw.withColumn(
        "ts", F.timestamp_seconds(F.lit(1577836800) + F.col("vec_id"))
    )


def stream_novel_buckets(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 8,
    bands: int = 4,
    watermark: str = "1 hour",
    bounded_state: bool = False,
) -> DataFrame:
    """Streaming MinHash near-dup detection: first-seen LSH bucket per
    (band, bhash) — the incremental form of the batch banded bucket
    join.  An arriving doc whose every band key was already seen is a
    near-duplicate of something in state; a doc emitting at least one
    row here is novel.

    Pipeline: per-row band keys (``similarity.minhash_band_keys`` —
    pure stateless projections, no aggregate, so it runs in append
    mode) -> watermark -> dedup on the bucket key.  Two state regimes:

    - ``bounded_state=False`` (default, the oracle-checked arm):
      ``dropDuplicates(["band", "bhash"])``.  Because the event-time
      column is NOT in the dedup keys, Spark never evicts this state —
      it is the GLOBAL distinct-bucket set, growing with corpus
      distinct buckets (bands x effective vocabulary), not bounded by
      the watermark.  That is exactly what makes the emitted set equal
      the batch-distinct bucket set regardless of micro-batch arrival
      order (parity-tested); it is the right arm for bounded backfills
      and for corpora whose bucket cardinality fits state (the bucket
      row is ~24 bytes; 1e9 buckets ~ 24 GB across the cluster).
    - ``bounded_state=True`` (the indefinite-ingestion arm):
      ``dropDuplicatesWithinWatermark`` — state rows ARE evicted once
      the watermark passes them, so state is one row per distinct
      bucket seen within the horizon.  A bucket quiet for longer than
      the watermark is re-emitted on return (first-seen-within-horizon
      semantics): dedup becomes approximate across horizons, which is
      the standard production trade for unbounded streams and why this
      arm is NOT the oracle-checked one."""
    from financial_data_science_spark.functions.similarity import (
        minhash_band_keys,
    )

    keys = minhash_band_keys(
        stream, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, bands=bands,
    )
    wm = keys.withWatermark(ts_col, watermark)
    if bounded_state:
        return wm.dropDuplicatesWithinWatermark(["band", "bhash"])
    return wm.dropDuplicates(["band", "bhash"])


# scratch dirs created by sentinel_stream(path=None); swept once at
# interpreter exit (see the lifetime contract in its docstring)
_SENTINEL_SCRATCH_DIRS: list[str] = []


def _sweep_sentinel_scratch() -> None:
    import shutil

    while _SENTINEL_SCRATCH_DIRS:
        shutil.rmtree(_SENTINEL_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_sweep_sentinel_scratch)


def sentinel_stream(
    spark: SparkSession,
    rows: list,
    schema: T.StructType | str,
    path: str | None = None,
) -> DataFrame:
    """One-batch file-backed streaming source carrying watermark-
    advancing SENTINEL rows — the drain recipe for append-mode stateful
    operators over BOUNDED replays.

    The emission-horizon contract (streaming/ann.py module docstring):
    in append mode a group emits only when the watermark passes its
    window end, and the watermark advances only on ARRIVALS — so a
    drained backfill leaves its final in-horizon windows unemitted.  A
    live stream flushes them with its next real arrival; a bounded
    replay flushes them by unioning ONE sentinel row whose event time
    exceeds the last real window end plus the watermark delay, then
    filtering the sentinel's own output rows downstream.

    Static frames cannot union into a streaming DAG, so the sentinel is
    written to a scratch parquet dir and read back with ``readStream``
    (same one-file => one-batch shape as the testdata readers).  Union
    it at the point the event-time column exists — typically just
    before ``withWatermark`` — with ids no real row uses (e.g. -1) so a
    trailing ``filter`` removes its outputs.

    Lifetime contract: auto-created scratch dirs live until THIS
    interpreter exits (one shared atexit sweep, not one handler per
    call).  A query restarted from a checkpoint by a LATER interpreter
    would find its sentinel source gone — the recipe targets bounded
    single-process replays (gates, probes, backfills), not
    checkpoint-recovered production queries; those should pass an
    explicit durable ``path`` they own."""
    import shutil
    import tempfile

    if path is None:
        path = tempfile.mkdtemp(prefix="flush_sentinel_")
        # scratch dirs are per-call (a FileStreamSource's listing is
        # keyed on the path, so reuse across queries would replay stale
        # sentinels); swept by ONE interpreter-exit handler shared
        # across all calls instead of accumulating an atexit entry per
        # sentinel over long pytest/gate sessions
        _SENTINEL_SCRATCH_DIRS.append(path)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    written = spark.read.parquet(path).schema
    return spark.readStream.schema(written).format("parquet").load(path)
