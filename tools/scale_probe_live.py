"""LIVE-arrival probe for the fused ingestion DAG (r10 verdict item 5).

scale_probe_tagged proves the DAG under a drained AvailableNow replay
with the flush sentinel; production is a LIVE stream where the
watermark advances on real arrivals.  This probe runs
curate_and_tag_stream against files arriving in real time — a feeder
thread moves one pre-written parquet file into the watched dir every
FEED_SEC seconds, each file's event times set to its planned arrival
wall-clock — and measures the three live-mode properties the verdict
asked for:

1. emission latency: per emitted doc, sink wall time minus its file's
   actual arrival wall time.  Model: p95 ~= n_stateful_ops * horizon +
   feed interval + trigger.  EACH chained windowed aggregate adds one
   full window duration — Spark delays a downstream stateful
   operator's eviction watermark by the upstream window so rows the
   parent aggregate has yet to emit are never dropped as late; the
   probe runs a 1-op arm (curate_document_stream window-ARGMIN) and
   the 2-op fused arm (curate_and_tag_stream) so the per-op horizon
   cost is measured, not assumed;
2. state-row ceiling: numRowsTotal per stateful operator across all
   progress events, over a feed lasting >= 4x the horizon — flat
   (plateau, not growth) because every aggregate evicts at the
   watermark;
3. sustained docs/s through the full screen -> gate -> novelty (->
   tag) DAG.

The final in-horizon windows stay unemitted when the feed stops — the
live-mode property the flush sentinel exists to close for bounded
replays; the probe reports the emitted share so that tail is visible
rather than hidden.

Run: PYTHONPATH=/root/repo python tools/scale_probe_live.py
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

HORIZON_SEC = 30          # novelty window ("30 seconds")
FEED_SEC = 5.0            # one file arrives every 5s
N_FILES = int(os.environ.get("LIVE_FILES", "24"))   # 120s feed = 4x horizon
ROWS_PER_FILE = int(os.environ.get("LIVE_ROWS", "500"))
TRIGGER = "2 seconds"


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from financial_data_science_spark.functions.classifier import logistic_irls
from financial_data_science_spark.functions.pipeline import ngram_hashes
from financial_data_science_spark.functions.similarity import ivf_build_index
from financial_data_science_spark.queries import _doc_quality_feats
from financial_data_science_spark.sources.testdata import load_tables

from financial_data_science_spark.streaming.curation import (  # noqa: E402
    curate_and_tag_stream,
)

tabs = load_tables(spark, "/root/testdata/sf0.1")
docs, emb = tabs["documents"], tabs["embeddings"]

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])

# ---- offline legs once (the standing corpus does not change live) ----
feats = _doc_quality_feats(docs, materialize=True)
traj = logistic_irls(feats, ["x1", "x2"], "y", iters=3)
b = traj[-1]
beta = (b["b0"], b["b1"], b["b2"])
scored = feats.select(
    F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(
        -(F.lit(beta[0]) + F.lit(beta[1]) * F.col("x1")
          + F.lit(beta[2]) * F.col("x2")))), 6).alias("p6"))
med = scored.agg(F.percentile("p6", F.lit(0.5)).alias("m")).collect()[0]["m"]
bench_set = [
    r["h"] for r in docs.filter(F.col("doc_id") % 17 == 0)
    .select(F.explode(ngram_hashes(F.col("text"), 5, False)).alias("h"))
    .distinct().collect()
]
bc = spark.sparkContext.broadcast(frozenset(bench_set))
index = ivf_build_index(emb, nlist=8, iters=3, train_mod=4)

# ---- pre-write the arrival files ----
# Event time is a SYNTHETIC timeline advancing at the real-time rate:
# file i carries ts = base_epoch + i*FEED_SEC and is moved into the
# watched dir i*FEED_SEC wall-seconds after the feed starts — the
# watermark advances on arrivals, so wall-clock emission delays are
# exactly what a wall-aligned stream would show, without baking the
# (unknowable) feed start time into parquet.  Live ids are sequential;
# text is the sf0.1 corpus cycled with a per-doc suffix so live shingle
# sets are (mostly) novel; every live id gets an embedding (the corpus
# vectors cycled) so the tag join is exercised end to end.
total = N_FILES * ROWS_PER_FILE
n_docs = docs.count()
base = docs.select(
    (F.col("doc_id") % n_docs).alias("k"), "text", "n_chars")
live = (
    spark.range(total).withColumnRenamed("id", "doc_id")
    .withColumn("k", F.col("doc_id") % n_docs)
    .join(base, "k")
    .select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" live"),
                 F.col("doc_id").cast("string")).alias("text"),
        "n_chars",
        F.timestamp_seconds(
            F.lit(1577836800) + F.floor(F.col("doc_id") / ROWS_PER_FILE)
            * F.lit(FEED_SEC)).alias("ts"),
    )
)
assert live.count() == total, "doc_id %% n_docs is not a bijection"
stage = tempfile.mkdtemp(prefix="live_stage_")
for i in range(N_FILES):
    live.filter(
        (F.col("doc_id") >= i * ROWS_PER_FILE)
        & (F.col("doc_id") < (i + 1) * ROWS_PER_FILE)
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, f"f{i:03d}"))

n_vecs = emb.count()
vectors = (
    spark.range(total).withColumnRenamed("id", "vec_id")
    .withColumn("k", (F.col("vec_id") % n_vecs).cast("long"))
    .join(emb.withColumnRenamed("vec_id", "k"), "k")
    .select("vec_id", "embedding")
)
assert vectors.count() == total, "vec_id %% n_vecs is not a bijection"


def run_arm(arm_name: str, build_dag, n_stateful: int) -> dict:
    """Feed the pre-staged files into a fresh watched dir in real time
    and measure one DAG arm end to end."""
    watch = tempfile.mkdtemp(prefix=f"live_watch_{arm_name}_")
    stream = (spark.readStream.schema(SCHEMA).format("parquet")
              .load(watch))
    sink_df = build_dag(stream)

    emitted: list[tuple[float, list[int]]] = []

    def sink(batch_df, batch_id):
        ids = [r["doc_id"] for r in batch_df.select("doc_id").collect()]
        if ids:
            emitted.append((time.time(), ids))

    arrival_wall: dict[int, float] = {}

    def feeder(t0: float):
        for i in range(N_FILES):
            time.sleep(max(0.0, t0 + i * FEED_SEC - time.time()))
            src_dir = os.path.join(stage, f"f{i:03d}")
            part = next(f for f in os.listdir(src_dir)
                        if f.endswith(".parquet"))
            # copy to a temp name, then one atomic rename per arrival —
            # the file source must never list a half-written file (and
            # the staged copy stays put for the next arm)
            tmp = os.path.join(watch, f".f{i:03d}.tmp")
            shutil.copy(os.path.join(src_dir, part), tmp)
            os.rename(tmp, os.path.join(watch, f"f{i:03d}.parquet"))
            arrival_wall[i] = time.time()

    s0, w0 = _steal(), time.time()
    q = (sink_df.writeStream.outputMode("append")
         .trigger(processingTime=TRIGGER).foreachBatch(sink).start())
    th = threading.Thread(target=feeder, args=(time.time() + 3.0,),
                          daemon=True)
    th.start()
    th.join()
    # after the last arrival the watermark stops advancing; give the
    # query a few triggers to emit everything that CAN emit live
    time.sleep(3 * HORIZON_SEC / 2)
    progress = list(q.recentProgress)
    q.stop()
    wall = time.time() - w0
    stl = round(100.0 * (_steal() - s0) * 0.01 / wall, 2)
    shutil.rmtree(watch, ignore_errors=True)

    # ---- emission delays: emit wall - the doc's file arrival wall ----
    delays = sorted(
        t - arrival_wall[doc // ROWS_PER_FILE]
        for t, ids in emitted for doc in ids
    )
    n_emit = len(delays)

    def pct(p):
        return (round(delays[min(n_emit - 1, int(p * n_emit))], 2)
                if delays else None)

    # ---- state rows per stateful operator (keyed by POSITION — both
    # windowed aggregates report operatorName "stateStoreSave") ----
    state: dict[str, list[int]] = {}
    for pr in progress:
        for i, op in enumerate(pr.get("stateOperators") or []):
            state.setdefault(f"op{i}:{op['operatorName']}", []).append(
                op["numRowsTotal"])
    ceilings = {
        k: {"max": max(v), "last": v[-1],
            "series_every8": v[::8], "series_len": len(v)}
        for k, v in state.items()
    }

    return {
        "arm": arm_name,
        "stateful_ops": n_stateful,
        "total_docs": total,
        "feed_sec": N_FILES * FEED_SEC,
        "horizon_sec": HORIZON_SEC,
        "trigger": TRIGGER,
        "docs_per_sec_arrival": round(total / (N_FILES * FEED_SEC), 1),
        "emitted_rows": n_emit,
        "emission_delay_p50": pct(0.50),
        "emission_delay_p95": pct(0.95),
        "emission_delay_max": pct(1.0),
        # each chained windowed aggregate adds ONE window duration to
        # the end-to-end emission horizon: Spark delays a downstream
        # stateful operator's eviction watermark by the upstream
        # window so rows a parent aggregate has yet to emit are never
        # treated as late — so the model is n_ops*horizon + the
        # watermark-advancing arrival gap + a trigger
        "expected_p95_model": n_stateful * HORIZON_SEC + FEED_SEC + 2.0,
        "steal_pct_of_wall_1cpu": stl,
        "wall_sec": round(wall, 1),
        "state_rows": ceilings,
    }


def fused_dag(stream):
    return curate_and_tag_stream(
        stream, spark, beta=beta, score_cut=med, bench_hashes=bc,
        index=index, vectors=vectors,
        novelty_window=f"{HORIZON_SEC} seconds", watermark="0 seconds",
        portable_grams=False, nprobe=2,
    )


def bounded_dag(stream):
    from financial_data_science_spark.streaming.curation import (
        curate_document_stream,
    )

    return curate_document_stream(
        stream, spark, beta=beta, score_cut=med, bench_hashes=bc,
        novelty_window=f"{HORIZON_SEC} seconds", watermark="0 seconds",
        portable_grams=False,
    )


results = [
    run_arm("bounded_novelty_1op", bounded_dag, 1),
    run_arm("fused_tag_2ops", fused_dag, 2),
]
print(json.dumps(results, indent=1))
shutil.rmtree(stage, ignore_errors=True)
