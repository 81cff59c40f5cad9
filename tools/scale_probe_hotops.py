"""Measured scale probe for the remaining SURVEY-§6 hot operators:
A2 groupwise compounding, A6 breakpoint fractiles, A11 tick binning.
Blows up sf0.1 inputs 10x/50x by unioning key-shifted copies (same
group cardinality growth as real scale-up) and times each operator.
Run: PYTHONPATH=/root/repo python tools/scale_probe_hotops.py"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession, functions as F
from financial_data_science_spark.operators import (
    bin_aggregate, compound_returns, fractile_split,
)
from financial_data_science_spark.sources.testdata import load_tables

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "32g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
t = load_tables(spark, "/root/testdata/sf0.1")

def blowup(df, key, mult):
    """mult key-shifted copies — rows AND group count scale together."""
    c = df
    out = None
    for m in range(mult):
        part = c.withColumn(key, F.col(key) + F.lit(m * 1_000_000))
        out = part if out is None else out.unionByName(part)
    return out

li = t["lineitem"].select(
    "l_suppkey",
    (F.year("l_shipdate") * 10000 + F.month("l_shipdate") * 100
     + F.dayofmonth("l_shipdate")).alias("date"),
    (F.col("l_discount") - 0.04).alias("ret"),
    "l_extendedprice",
)
ev = t["events"].select("user_id", "ts", "value")

for mult in (1, 10, 50):
    lib = blowup(li, "l_suppkey", mult).localCheckpoint(eager=True)
    evb = blowup(ev, "user_id", mult).localCheckpoint(eager=True)
    n_li, n_ev = lib.count(), evb.count()

    t0 = time.time()
    compound_returns(lib, "l_suppkey", beg=19940101, end=19971231).count()
    t_a2 = time.time() - t0

    t0 = time.time()
    fractile_split(
        lib, "l_extendedprice", key_filter=(F.col("l_suppkey") % 4 == 0)
    ).count()
    t_a6 = time.time() - t0

    t0 = time.time()
    bin_aggregate(
        evb, "ts", "5 minutes", keys="user_id",
        aggs={"n": F.count(F.lit(1)), "vwap": F.sum("value") / F.count(F.lit(1)),
              "hi": F.max("value"), "lo": F.min("value")},
    ).count()
    t_a11 = time.time() - t0

    print(f"mult={mult:3d} lineitem={n_li:9d} events={n_ev:9d} "
          f"A2 compound={t_a2:6.2f}s  A6 fractiles={t_a6:6.2f}s  "
          f"A11 bins={t_a11:6.2f}s", flush=True)
    lib.unpersist(); evb.unpersist()
