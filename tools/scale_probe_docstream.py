"""Measured streaming-throughput probe for the r7 document-stream
operators: MinHash novelty detection and the on-arrival contamination
screen, driven over k-x blowups of the sf0.1 documents table via a
multi-batch file source (maxFilesPerTrigger=1 -> one micro-batch per
file), Trigger.AvailableNow, noop sink.  Reports rows/sec and, for the
novelty path, the dedup-state row count (distinct buckets).
Run: PYTHONPATH=/root/repo python tools/scale_probe_docstream.py"""
import os, sys, tempfile, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from pyspark.sql import types as T

from financial_data_science_spark.functions.pipeline import ngram_hashes
from financial_data_science_spark.sources.testdata import load_tables
from financial_data_science_spark.streaming.windows import stream_novel_buckets

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = load_tables(spark, "/root/testdata/sf0.1")["documents"]

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def make_source(mult, n_files=8):
    d = tempfile.mkdtemp(prefix=f"docstream{mult}_")
    big = None
    for m in range(mult):
        # replica docs get a suffix token so buckets stay non-degenerate
        p = docs.select(
            (F.col("doc_id") + F.lit(m * 1_000_000)).alias("doc_id"),
            (F.concat(F.col("text"), F.lit(f" rep{m}")) if m else
             F.col("text")).alias("text"),
        )
        big = p if big is None else big.unionByName(p)
    big = big.withColumn(
        "ts", F.timestamp_seconds(F.lit(1577836800) + F.col("doc_id"))
    )
    big.repartition(n_files).write.mode("overwrite").parquet(d)
    files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
    now = 1_700_000_000
    for i, f in enumerate(files):
        os.utime(os.path.join(d, f), (now + i, now + i))
    return d, big.count()


bench_hashes = F.broadcast(
    docs.filter(F.col("doc_id") % 17 == 0)
    .select(F.explode(ngram_hashes(F.col("text"), 5, False)).alias("__h__"))
    .distinct()
)

for mult in (1, 10):
    d, n = make_source(mult)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/*.parquet"))
    novel = stream_novel_buckets(stream, num_hashes=8, bands=4,
                                 watermark="100 days")
    t0 = time.time()
    q = (novel.writeStream.outputMode("append").format("noop")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    w1 = time.time() - t0
    print(f"mult={mult:3d} docs={n:7d} minhash-novelty wall={w1:6.2f}s "
          f"({n / w1:,.0f} docs/s across 8 micro-batches)", flush=True)

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/*.parquet"))
    g = stream.select(
        "doc_id", "ts",
        F.explode(ngram_hashes(F.col("text"), 5, False)).alias("__h__"),
    )
    flags = (g.join(bench_hashes, "__h__")
             .groupBy(F.window("ts", "1 second"), "doc_id")
             .agg(F.count(F.lit(1)).alias("n_contaminated")))
    t0 = time.time()
    q = (flags.writeStream.outputMode("update").format("noop")
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    w2 = time.time() - t0
    print(f"mult={mult:3d} docs={n:7d} contamination   wall={w2:6.2f}s "
          f"({n / w2:,.0f} docs/s)", flush=True)

# ---- composed curation pipeline (r8): the three stages FUSED in one
# streaming DAG — mapInPandas contamination screen (xxhash64 grams, the
# production hash) -> trained logistic gate (betas trained offline in
# batch, entering as literals) -> band keys -> ONE dropDuplicates.
# This composition, not the pieces, is the 100 TB/day ingestion shape.
from financial_data_science_spark.functions.classifier import logistic_irls
from financial_data_science_spark.functions.pipeline import (
    contamination_screen,
)
from financial_data_science_spark.functions.similarity import (
    minhash_band_keys,
)
from financial_data_science_spark.functions.text import n_tokens

_ntok_d = (F.lit(1.0) + n_tokens("text").cast("double"))
feats = docs.select(
    (F.col("lang") == "en").cast("double").alias("y"),
    F.log(_ntok_d).alias("x1"),
    (F.col("n_chars").cast("double") / _ntok_d).alias("x2"),
).localCheckpoint(eager=True)
_tb = logistic_irls(feats, ["x1", "x2"], "y", iters=3)[-1]
bench_set = [r["__h__"] for r in bench_hashes.collect()]

for mult in (1, 10):
    d, n = make_source(mult)
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(f"{d}/*.parquet"))
    # schema has no n_chars; length(text) is the same signal here
    _nt = (F.lit(1.0) + n_tokens("text").cast("double"))
    p6 = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(
            F.lit(_tb["b0"]) + F.lit(_tb["b1"]) * F.log(_nt)
            + F.lit(_tb["b2"]) * (F.length("text").cast("double") / _nt)
        ))),
        6,
    )
    curated = contamination_screen(
        stream, spark, bench_set, n=5, portable=False
    ).filter(p6 > F.lit(0.5))
    buckets = (minhash_band_keys(curated, num_hashes=8, bands=4)
               .withWatermark("ts", "100 days")
               .dropDuplicates(["band", "bhash"]))
    t0 = time.time()
    q = (buckets.writeStream.outputMode("append").format("noop")
         .trigger(availableNow=True).start())
    q.awaitTermination(1200)
    w3 = time.time() - t0
    print(f"mult={mult:3d} docs={n:7d} composed-curate wall={w3:6.2f}s "
          f"({n / w3:,.0f} docs/s: screen+gate+novelty in ONE DAG)",
          flush=True)
