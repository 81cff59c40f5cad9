"""Scale probe: training-pipeline operators at document blowups.

Blows up `documents` k-x with suffix-tagged copies (cross-copy n-grams
never collide, so the contamination join structure scales exactly k-x)
and times: contamination (production xxhash64 path), token-budget shard
packing (two-phase prefix sum), and the deterministic hash split (pure
map — the control: should be scan-bound).

Usage: PYTHONPATH=/root/repo python tools/scale_probe_pipeline.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from financial_data_science_spark.functions.pipeline import (
    contamination,
    hash_split,
    pack_token_budget,
)
from financial_data_science_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def blowup(docs, k):
    """k distinct copies; every word suffix-tagged per copy so cross-copy
    n-grams are disjoint (same trick as the LSH probe)."""
    c = docs.withColumn("copy", F.explode(F.sequence(F.lit(1), F.lit(k))))
    tagged = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.concat(w, F.lit("_"), F.col("copy")),
        ),
        " ",
    )
    return c.select(
        (F.col("doc_id") * k + F.col("copy") - 1).alias("doc_id"),
        tagged.alias("text"),
    )


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    for k in (1, 10, 20):
        d = blowup(base, k).repartition(32).persist()
        n = d.count()
        t0 = time.time()
        contamination(
            d.filter(F.col("doc_id") % 17 != 0),
            d.filter(F.col("doc_id") % 17 == 0),
            n=5,
            portable=False,
        ).count()
        t_con = time.time() - t0
        toks = d.select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        )
        t0 = time.time()
        pack_token_budget(toks, "doc_id", "n_tokens", budget=20000).agg(
            F.max("shard")
        ).collect()
        t_pack = time.time() - t0
        t0 = time.time()
        hash_split(d, "doc_id", {"train": 0.9, "val": 0.1}).agg(
            F.count(F.lit(1))
        ).collect()
        t_split = time.time() - t0
        print(
            f"docs={n:>7} contamination={t_con:.2f}s "
            f"packing={t_pack:.2f}s split={t_split:.2f}s"
        )
        d.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
