"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  Covers the five hot operators
(SURVEY §6): as-of join (J1), event-window join (J4), groupwise
compounding (A2), breakpoint deciles (A6), tick binning (A11) — plus
TPC-H-shaped scan/join/agg and the LLM-pipeline operators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "asof_join_backward",
    "event_window_trading_days",
    "event_range_agg_1h",
    "compound_returns_by_supplier",
    "fractile_deciles",
    "tick_bins_5min",
    "tw_value_5min",
    "prevailing_click_at_purchase",
    "monthly_rollup",
    "holdings_turnover",
    "sessionization",
    "jaccard_near_dups",
    "minhash_lsh_candidates",
    "cosine_topk",
    "text_quality",
]


def main() -> None:
    from financial_data_science_spark import get_spark
    from financial_data_science_spark.queries import Q

    spark = get_spark("bench")
    # warm the JVM + parquet footers with one tiny action per table
    from financial_data_science_spark.sources.testdata import load_tables

    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()

    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # min of 2 runs: this host shows heavy CPU-steal variance; the min
        # reflects steady-state plan cost rather than hypervisor noise
        best, n = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            df = Q[name](spark, SF_DIR)
            n = df.count()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        print(f"# {name}: {n} rows in {times[name]:.2f}s", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
