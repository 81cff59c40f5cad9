"""On-arrival ANN output-mode probe (r9): complete vs append at scale.

Blows up the sf0.1 embeddings to N arrival epochs (one parquet file per
epoch -> one micro-batch each, maxFilesPerTrigger=1, noop sink) and
runs the SAME on-arrival nearest-neighbor DAG (streaming/ann.py) in
both output modes, printing per-epoch batch durations from the query
progress log.  The claim under test: complete mode re-emits every
accumulated per-arrival group each micro-batch (per-epoch cost grows
linearly with arrivals so far -> quadratic total), while the
append+watermark arm emits each argmax once and evicts its state
(per-epoch cost flat).  Run:
PYTHONPATH=/root/repo python tools/scale_probe_streamann.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_science_spark.functions.similarity import ivf_build_index
from financial_data_science_spark.sources.testdata import load_table
from financial_data_science_spark.streaming.ann import on_arrival_nearest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EPOCHS = int(os.environ.get("PROBE_EPOCHS", "8"))
MULT = int(os.environ.get("PROBE_MULT", "10"))  # 10 x 2k = 20k arrivals

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("ts", T.TimestampType()),
    ]
)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    n_base = emb.count()
    index = ivf_build_index(emb, nlist=8, iters=3, train_mod=4)

    # MULT perturbed copies of the corpus as the arrival stream; write
    # one file per epoch so each epoch is one micro-batch
    d = tempfile.mkdtemp(prefix="streamann_")
    arrivals = emb.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(MULT - 1)))
    ).select(
        (F.col("vec_id") + F.col("copy") * n_base).alias("vec_id"),
        F.transform(
            "embedding", lambda v: v + (F.col("copy") % 7) * F.lit(0.001)
        ).cast("array<float>").alias("embedding"),
    )
    arrivals = arrivals.withColumn(
        "ts", F.timestamp_seconds(F.lit(1577836800) + F.col("vec_id"))
    )
    n_total = n_base * MULT
    per_epoch = n_total // EPOCHS
    arrivals.withColumn(
        "__e__", F.floor(F.col("vec_id") / per_epoch).cast("int")
    ).write.partitionBy("__e__").mode("overwrite").parquet(d)
    # order epoch dirs by mtime so maxFilesPerTrigger feeds them in order
    now = 1_700_000_000
    files = []
    for e in range(EPOCHS + 1):
        sub = os.path.join(d, f"__e__={e}")
        if os.path.isdir(sub):
            for f in sorted(os.listdir(sub)):
                if f.endswith(".parquet"):
                    files.append(os.path.join(sub, f))
    for i, f in enumerate(files):
        os.utime(f, (now + i, now + i))

    for mode, wm in (("append", "0 seconds"), ("complete", None)):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/__e__=*/*.parquet")
        )
        best = on_arrival_nearest(stream, index, nprobe=2, watermark=wm)
        t0 = time.time()
        q = (
            best.writeStream.outputMode(mode)
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        wall = time.time() - t0
        prog = [
            (p.batchId, p.numInputRows, p.durationMs.get("triggerExecution"))
            for p in (q.recentProgress or [])
        ]
        print(
            f"mode={mode:8s} arrivals={n_total:,} wall={wall:7.2f}s "
            f"({n_total / wall:,.0f} vec/s)",
            flush=True,
        )
        for bid, rows, ms in prog:
            print(f"   epoch {bid}: {rows:6,} rows  {ms/1000.0:7.2f}s",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
