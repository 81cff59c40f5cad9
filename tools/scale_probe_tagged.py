"""Sustained-throughput probe for the FUSED ingestion DAG
(curate_and_tag_stream): screen -> trained gate -> window-argmin
novelty -> IVF nearest-existing-neighbor tag, one streaming query, two
chained stateful aggregates — driven over a k-x blowup of the sf0.1
documents table as a multi-batch file source (maxFilesPerTrigger=1 ->
one micro-batch per file, files range-partitioned by event time so
arrival order respects the watermark), Trigger.AvailableNow-equivalent
drain, noop sink, flush sentinel for the final windows.

The r9 verdict asked for ONE fused measurement at the 10x blowup to
make the 100 TB/day composition claim load-bearing (the stages were
previously probed separately).  Reports per-epoch walls and sustained
docs/sec at each blowup factor.

Run: PYTHONPATH=/root/repo python tools/scale_probe_tagged.py
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
from financial_data_science_spark.streaming.curation import (
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


def make_source(mult: int, n_files: int = 8):
    d = tempfile.mkdtemp(prefix=f"tagstream{mult}_")
    big = None
    for m in range(mult):
        p = docs.select(
            (F.col("doc_id") + F.lit(m * 1_000_000)).alias("doc_id"),
            (F.concat(F.col("text"), F.lit(f" rep{m}")) if m else
             F.col("text")).alias("text"),
            F.col("n_chars"),
        )
        big = p if big is None else big.unionByName(p)
    big = big.withColumn(
        "ts", F.timestamp_seconds(F.lit(1577836800) + F.col("doc_id"))
    )
    # range-partition on ts so file i's rows all precede file i+1's:
    # micro-batch arrival order then respects event time and a short
    # watermark never drops late rows
    big.repartitionByRange(n_files, "ts").write.mode("overwrite").parquet(d)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    now = 1_700_000_000
    for i, f in enumerate(files):
        os.utime(os.path.join(d, f), (now + i, now + i))
    # stats from the WRITTEN files (one scan), not by re-running the
    # k-way union-and-concat DAG once per driver action
    stats = spark.read.parquet(d).agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("m")
    ).collect()[0]
    return d, stats["n"], stats["m"]


def vectors_for(mult: int):
    out = None
    for m in range(mult):
        p = emb.select(
            (F.col("vec_id") + F.lit(m * 1_000_000)).alias("vec_id"),
            "embedding",
        )
        out = p if out is None else out.unionByName(p)
    return out


# ---- offline legs once (the standing corpus does not change per run)
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

for mult in (1, 10):
    src, total, max_id = make_source(mult)
    stream = (spark.readStream.schema(SCHEMA).format("parquet")
              .option("maxFilesPerTrigger", "1").load(src))
    flush_ts = datetime.fromtimestamp(
        1577836800 + (max_id // 180 + 1) * 180 + 1, tz=timezone.utc)
    tagged = curate_and_tag_stream(
        stream, spark, beta=beta, score_cut=med, bench_hashes=bc,
        index=index, vectors=vectors_for(mult),
        novelty_window="3 minutes", watermark="0 seconds",
        portable_grams=False, nprobe=2, flush_ts=flush_ts,
    )
    s0, t0 = _steal(), time.time()
    q = (tagged.writeStream.outputMode("append").format("noop").start())
    epochs = []
    q.processAllAvailable()
    wall = time.time() - t0
    for p in q.recentProgress:
        epochs.append((p["batchId"], p["numInputRows"],
                       round(p["durationMs"]["triggerExecution"] / 1e3, 2)))
    q.stop()
    stl = round(100.0 * (_steal() - s0) * 0.01 / wall, 2)
    print(f"mult={mult}: {total} docs in {wall:.1f}s = "
          f"{total / wall:,.0f} docs/s sustained, steal {stl}%")
    print(f"  per-epoch (batch, rows, sec): {epochs}")
