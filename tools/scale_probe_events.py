"""Scale probe: event-window gather (J4) and as-of union join (J1).

Blows up the EVENT / LEFT side k-x with deterministic shifted copies
(each copy gets distinct anchors, so matched structure scales exactly
k-x) against a fixed sf0.1 fact side, and times the operator.  The two
SURVEY-§4 "deliberate design" claims under test:

  J4: fan-out = window length on the events side ONLY; the fact table is
      joined ONCE on an equi-key.  Wall should grow far slower than k
      (fixed overhead + linear join probe), never like |fact| x window.
  J1 union strategy: one shuffle per side on (by, time), no row fan-out.
      Wall should grow sub-linearly in the unioned row count, unlike a
      range-join whose candidate pairs grow multiplicatively.

Usage: PYTHONPATH=/root/repo python tools/scale_probe_events.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from financial_data_science_spark.operators.asof import asof_join
from financial_data_science_spark.operators.events import event_window
from financial_data_science_spark.sources.testdata import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
    t = load_tables(spark, SF_DIR)
    li, orders, events = t["lineitem"], t["orders"], t["events"]

    # fixed fact side: one (suppkey, date) value series, 600k source rows
    fact = li.select(
        F.col("l_suppkey").alias("permno"),
        F.col("l_shipdate").alias("date"),
        F.col("l_extendedprice").alias("val"),
    )
    fact = fact.repartition(32).persist()
    fact.count()

    # base anchors: ~3k (suppkey, orderdate) events
    base_ev = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("l_suppkey").alias("permno"), F.col("o_orderdate").alias("adate"))
        .distinct()
        .limit(3000)
    )

    # warmup: spin the JVM/codegen so k=1 isn't charged first-job cost
    fact.limit(10).join(fact.limit(10), "permno").count()

    print("== J4 event_window: events-side blowup, window [-5,+5] ==")
    for k in (1, 10, 50):
        ev = base_ev.withColumn("copy", F.explode(F.sequence(F.lit(1), F.lit(k))))
        # shift each copy's anchor so copies are distinct anchors
        ev = ev.select(
            "permno", F.date_add("adate", F.col("copy") * 0 + F.col("copy") - 1).alias("adate")
        )
        ev = ev.repartition(32).persist()
        n_ev = ev.count()
        t0 = time.time()
        out = event_window(
            ev, fact, by="permno", event_date="adate", fact_date="date",
            values=["val"], left=-5, right=5,
        )
        n = out.count()
        print(f"events={n_ev:>7} window_rows={n:>9} wall={time.time()-t0:.2f}s")
        ev.unpersist()

    # as-of: left = event ticks blown up k-x, right = fixed quote frame
    quotes = events.select(
        F.col("user_id").alias("key"),
        F.col("ts").cast("timestamp").alias("qts"),
        F.col("value").alias("quote"),
    )
    base_left = events.select(
        F.col("user_id").alias("key"), F.col("ts").cast("timestamp").alias("tts")
    )

    print("== J1 asof_join(strategy=union): left-side blowup ==")
    for k in (1, 10, 50):
        lt = base_left.withColumn(
            "copy", F.explode(F.sequence(F.lit(1), F.lit(k)))
        ).select(
            "key",
            (F.col("tts") + F.make_interval(secs=F.col("copy") * 7)).alias("tts"),
        )
        lt = lt.repartition(32).persist()
        n_left = lt.count()
        t0 = time.time()
        out = asof_join(
            lt, quotes, by="key", left_on="tts", right_on="qts",
            direction="backward", strategy="union",
        )
        # force the matched payload (a bare count could let Catalyst prune
        # the window-carried quote column)
        n = out.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.hash("quote")).alias("h")
        ).collect()[0]["n"]
        print(f"left={n_left:>8} matched_rows={n:>9} wall={time.time()-t0:.2f}s")
        lt.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
