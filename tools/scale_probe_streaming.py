"""Measured streaming-throughput probe: the tumbling-bin and stateful
EWMA operators driven over k-x blowups of the sf0.1 events table via a
multi-batch file source (maxFilesPerTrigger=1 -> one micro-batch per
file), Trigger.AvailableNow.  Reports rows/sec and per-key state size.
Run: PYTHONPATH=/root/repo python tools/scale_probe_streaming.py"""
import os, shutil, sys, tempfile, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T
from financial_data_science_spark.sources.testdata import load_tables
from financial_data_science_spark.streaming.windows import stream_bin_aggregate
from financial_data_science_spark.streaming.stateful import stream_ewma

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
ev = load_tables(spark, "/root/testdata/sf0.1")["events"].select(
    "user_id", "ts", "value")

SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("value", T.DoubleType()),
])

def make_source(mult, n_files=8):
    d = tempfile.mkdtemp(prefix=f"evstream{mult}_")
    big = None
    for m in range(mult):
        p = ev.withColumn("user_id", F.col("user_id") + F.lit(m * 1_000_000))
        big = p if big is None else big.unionByName(p)
    parts = big.repartition(n_files)
    parts.write.mode("overwrite").parquet(d)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    now = 1_700_000_000
    for i, f in enumerate(files):
        os.utime(os.path.join(d, f), (now + i, now + i))
    n = big.count()
    return d, n

for mult in (1, 10):
    d, n = make_source(mult)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/*.parquet"))
    binned = stream_bin_aggregate(
        stream, "ts", "5 minutes", keys="user_id",
        aggs={"n": F.count(F.lit(1)), "v": F.sum("value")})
    t0 = time.time()
    q = (binned.writeStream.outputMode("append").format("noop")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    w1 = time.time() - t0
    print(f"mult={mult:3d} rows={n:8d} tumbling-bins wall={w1:6.2f}s "
          f"({n/w1:,.0f} rows/s across 8 micro-batches)", flush=True)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/*.parquet")
              .select("user_id", F.unix_micros("ts").alias("ts_us"), "value"))
    e = stream_ewma(stream, alpha=0.1, key_col="user_id")
    t0 = time.time()
    q = (e.writeStream.outputMode("append").format("noop")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    w2 = time.time() - t0
    keys = 1000 * mult
    print(f"mult={mult:3d} rows={n:8d} stateful-EWMA wall={w2:6.2f}s "
          f"({n/w2:,.0f} rows/s, {keys} state keys x 2 doubles)", flush=True)
    shutil.rmtree(d)
