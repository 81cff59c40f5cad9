"""LIVE-arrival probe for the zero-state streaming index probe.

The curation DAGs obey the emission-latency law
p95 ~= n_stateful_ops x horizon + feed + trigger (scale_probe_live) —
chained windowed aggregates each hold a horizon.  The streaming index
probe (q:`stream_minhash_index_probe`) is the OTHER end of that
spectrum: band keys are per-row projections and the index join is
stream-static, so there is NO stateful operator, NO watermark, and the
claim to verify live is that emission latency collapses to feed gap +
trigger interval alone — independent of any horizon — while state rows
stay exactly zero and throughput tracks arrivals.

A feeder thread moves one pre-written parquet file (ROWS_PER_FILE docs)
into the watched dir every FEED_SEC seconds; a foreachBatch sink stamps
each emitted doc with the sink wall time; latency per doc = sink wall -
its file's actual arrival wall.

Run: PYTHONPATH=/root/repo python tools/scale_probe_index_live.py
"""
from __future__ import annotations

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

FEED_SEC = 3.0
N_FILES = int(os.environ.get("LIVE_FILES", "20"))
ROWS_PER_FILE = int(os.environ.get("LIVE_ROWS", "500"))
TRIGGER = "2 seconds"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from financial_data_science_spark.functions import minhash_index as MHI
from financial_data_science_spark.functions.similarity import minhash_band_keys
from financial_data_science_spark.sources.testdata import load_tables

docs = load_tables(spark, "/root/testdata/sf0.1")["documents"]
index = MHI.minhash_build_index(
    docs, num_hashes=8, bands=4, portable=True, persist=True
)

# live docs: corpus text cycled with a per-doc suffix, sequential ids
total = N_FILES * ROWS_PER_FILE
n_docs = docs.count()
base = docs.select((F.col("doc_id") % n_docs).alias("k"), "text")
live = (
    spark.range(total).withColumnRenamed("id", "doc_id")
    .withColumn("k", F.col("doc_id") % n_docs)
    .join(base, "k")
    .select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" live"),
                 F.col("doc_id").cast("string")).alias("text"),
    )
)
stage = tempfile.mkdtemp(prefix="idxlive_stage_")
for i in range(N_FILES):
    live.filter(
        (F.col("doc_id") >= i * ROWS_PER_FILE)
        & (F.col("doc_id") < (i + 1) * ROWS_PER_FILE)
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage, f"f{i:03d}")
    )

watch = tempfile.mkdtemp(prefix="idxlive_watch_")
SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])
stream = spark.readStream.schema(SCHEMA).format("parquet").load(watch)
probe = (
    minhash_band_keys(stream, num_hashes=8, bands=4)
    .select(F.col("doc_id").alias("new_id"), "band", "bhash")
    .join(index["buckets"], ["band", "bhash"])
    .select("new_id", "corpus_id")
)

emitted: list[tuple[float, int, int, int]] = []  # (wall, lo_id, hi_id, n_rows)
lock = threading.Lock()


def sink(batch_df, batch_id):
    rows = batch_df.groupBy().agg(
        F.min("new_id").alias("lo"), F.max("new_id").alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    if rows["n"]:
        with lock:
            emitted.append(
                (time.time(), int(rows["lo"]), int(rows["hi"]), int(rows["n"]))
            )


q = (
    probe.writeStream.foreachBatch(sink)
    .trigger(processingTime=TRIGGER)
    .option("checkpointLocation", tempfile.mkdtemp(prefix="idxlive_ckpt_"))
    .start()
)

arrivals: dict[int, float] = {}  # file index -> wall arrival
t0 = time.time()
for i in range(N_FILES):
    target = t0 + i * FEED_SEC
    time.sleep(max(0.0, target - time.time()))
    src = os.path.join(stage, f"f{i:03d}")
    for fn in os.listdir(src):
        if fn.endswith(".parquet"):
            shutil.copy(os.path.join(src, fn), os.path.join(watch, f"b{i:03d}.parquet"))
    arrivals[i] = time.time()

# drain: wait for the last file's rows (no watermark — nothing is held)
deadline = time.time() + 60
state_rows = []
while time.time() < deadline:
    time.sleep(2)
    p = q.lastProgress
    if p:
        state_rows.append(
            sum(op.get("numRowsTotal", 0) for op in p.get("stateOperators", []))
        )
    with lock:
        done = emitted and emitted[-1][2] >= total - 1
    if done:
        break
q.processAllAvailable()
q.stop()

# latency: per emitted batch, attribute to the OLDEST file included —
# conservative: when the DAG lags and a micro-batch coalesces several
# files, the reported delay is the worst row's, not the freshest's
lat = []
with lock:
    for wall, lo_id, hi_id, n in emitted:
        f_idx = lo_id // ROWS_PER_FILE
        lat.append(wall - arrivals.get(f_idx, t0))
lat.sort()
n_rows_total = sum(n for _, _, _, n in emitted)
p50 = lat[len(lat) // 2] if lat else float("nan")
p95 = lat[int(len(lat) * 0.95)] if lat else float("nan")
print(
    f"files={N_FILES} feed={FEED_SEC}s trigger={TRIGGER} "
    f"emitted_rows={n_rows_total} batches={len(emitted)} "
    f"latency p50={p50:.1f}s p95={p95:.1f}s "
    f"(model: <= feed {FEED_SEC:.0f}s + trigger 2s + batch wall) "
    f"state_rows max={max(state_rows) if state_rows else 0} "
    f"(must be 0 — no stateful operator)",
    flush=True,
)
shutil.rmtree(stage, ignore_errors=True)
shutil.rmtree(watch, ignore_errors=True)
