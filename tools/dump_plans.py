"""Regenerate PLANS.md: formatted physical plans of the hot operators at
sf0.01, annotated with what to look for.  Run:
PYTHONPATH=/root/repo python tools/dump_plans.py > PLANS.md"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from financial_data_science_spark.queries import Q

SF = "/root/testdata/sf0.01"

NOTES = {
    "q1_pricing_summary": "pushed filter reaches the parquet scan "
        "(PushedFilters) and ReadSchema carries only the projected columns; "
        "one partial+final HashAggregate pair inside WholeStageCodegen.",
    "asof_join_backward": "the union strategy: NO join node at all — two "
        "scans union, one Exchange on the by-key, one Sort + Window "
        "(last ignorenulls carry).  No fan-out anywhere.",
    "event_window_trading_days": "explode runs on the small event side "
        "only; the calendar joins are BroadcastHashJoin; the fact-table "
        "probe is one shuffled equi-join.",
    "fractile_deciles": "two aggregates: the NYSE-subset percentile pass "
        "collapses to a one-row broadcast (BroadcastExchange, not a "
        "re-join), bucketing is a map-side CASE over the scan.",
    "tick_bins_5min": "tumbling window = plain hash aggregate on the "
        "window struct; no Window operator, no sort — partial aggregation "
        "is map-side combinable.",
    "ann_ivf_topk": "centroid literals live inside the projection "
        "(no Exchange between scan and cluster assignment); the probe "
        "side is BroadcastExchange so the bin join is map-side.",
    "minhash_lsh_candidates": "signatures = one hash aggregate; band "
        "explode then self equi-join on (band, bhash) — shuffle volume "
        "is bands x docs rows, never a cross join.",
    "ann_ivfpq_query_only": "the train/query split's query half: the "
        "probe side is BroadcastExchange onto the pre-built coded "
        "corpus, ADC scoring is a map-side projection of codebook "
        "literals, and the only Exchange before the top-k Window is the "
        "build-time join already materialized in the index.",
    "hard_negative_mining": "label inequality rides inside the "
        "broadcast join condition (BroadcastNestedLoopJoin on the tiny "
        "query side), so same-label rows are dropped before cosine "
        "scoring; one Window for the per-query top-k.",
}

print("# PLANS — formatted physical plans of the hot operators\n")
print("Regenerate: `PYTHONPATH=. python tools/dump_plans.py > PLANS.md`.")
print("Captured at sf0.01 on local[8] with AQE on (AdaptiveSparkPlan")
print("isFinalPlan=false: the initial plan; AQE may further coalesce or")
print("switch join strategies at runtime using real statistics).\n")
for name, note in NOTES.items():
    df = Q[name](spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    print(f"## {name}\n")
    print(f"What to look for: {note}\n")
    print("```")
    print(plan.rstrip())
    print("```\n")
