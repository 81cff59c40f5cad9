"""Scale probe: full event-study pipeline at KeyDev-like event counts.

BASELINE.md cites the reference's event-study corpus at 12.3M KeyDev
rows; the sf0.1 fixture yields ~17k anchors.  This probe blows up the
ANCHOR (event) side k-x by cycling each anchor through shifted trading
days — every replica is a real (supplier, trading-day) pair, so the
gather left-join finds real facts and the measured cost is the
production shape, not null-probe filler.

What SCALE.md claims and this measures:
  - the event-window gather (J4) is explode + ONE equi-join: wall should
    scale ~linearly in anchors (never |facts| x window), and
  - corrected_stats' tau/rho machinery aggregates DOWN to per-day/
    per-date frames before any driver math, so the correction stage
    stays a constant tail regardless of k.

Usage: PYTHONPATH=/root/repo python tools/scale_probe_eventstudy.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from financial_data_science_spark import get_spark
from financial_data_science_spark.backtesting.eventstudy import corrected_stats
from financial_data_science_spark.operators.events import event_window
from financial_data_science_spark.plans.calendar import TradingCalendar
from financial_data_science_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("scale-probe-eventstudy")
    li = load_table(spark, SF_DIR, "lineitem")
    panel = (
        li.groupBy("l_suppkey", F.col("l_shipdate").alias("d"))
        .agg(F.round(F.sum("l_quantity"), 2).alias("qty"))
        .localCheckpoint(eager=True)
    )
    cal = TradingCalendar.from_dates(li.select(F.col("l_shipdate").alias("date")))
    caldim = cal.dim.localCheckpoint(eager=True)
    n_days = caldim.count()
    base_anchors = (
        panel.filter(F.col("qty") > 90)
        .select("l_suppkey", F.col("d").alias("anchor_d"))
        .join(caldim, F.col("anchor_d") == F.col("date"))
        .select("l_suppkey", "anchor_d", F.col("day_num").alias("base_num"))
        .localCheckpoint(eager=True)
    )
    n0 = base_anchors.count()
    print(f"# base anchors: {n0}, trading days: {n_days}", flush=True)

    ks = tuple(
        int(x) for x in os.environ.get("EVENTSTUDY_KS", "1,10,100").split(",")
    )
    for k in ks:
        # replica i shifts the anchor 7*i trading days (mod calendar),
        # clamped away from both ends so the full [-2, +6] window exists
        reps = spark.range(k).select(F.col("id").alias("rep"))
        shifted = (
            base_anchors.crossJoin(F.broadcast(reps))
            .withColumn(
                "num2",
                (F.col("base_num") - 1 + F.col("rep") * 7) % F.lit(n_days - 10)
                + F.lit(3),
            )
            .join(caldim, F.col("num2") == F.col("day_num"))
            .select("l_suppkey", F.col("date").alias("anchor_d"))
            .distinct()
        )
        t0 = time.time()
        gathered = event_window(
            shifted,
            panel.withColumnRenamed("d", "fact_d"),
            by="l_suppkey",
            event_date="anchor_d",
            fact_date="fact_d",
            values=["qty"],
            left=-2,
            right=6,
            calendar=caldim,
        ).withColumn("qty", F.coalesce("qty", F.lit(0.0)))
        wcar = (
            Window.partitionBy("l_suppkey", "anchor_d")
            .orderBy("rel")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cb = gathered.withColumn("cum", F.sum("qty").over(wcar))
        t_gather = time.time()
        n_gathered = cb.count()
        t_gathered = time.time()
        out = corrected_stats(
            cb, cal, left=-2, right=2, post=6,
            event_keys=["l_suppkey", "anchor_d"], event_date="anchor_d",
            value="cum", rho=0.3,
        ).collect()
        t_done = time.time()
        row = out[0].asDict()
        print(
            f"k={k:>3}: events={n_gathered // 9:>9,} gathered_rows={n_gathered:>10,} "
            f"gather={t_gathered - t0:6.2f}s corrected={t_done - t_gathered:6.2f}s "
            f"total={t_done - t0:6.2f}s "
            f"(window_t={row['window_t']:.3f}, eff={row['effective']:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
