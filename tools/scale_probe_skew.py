"""Planted-hot-key probe for the operators/skew.py helpers (measured).

operators/skew.py ships the two cases AQE can NOT fix on its own —
``salted_aggregate`` (a groupBy whose hottest key funnels a large row
fraction through one reducer: AQE's skew splitting is JOIN-only) and
``salted_broadcast_join`` (skewed fact ⋈ small dim without re-shuffling
the fact).  tests/test_plans.py pins their CORRECTNESS (salted ==
plain); this probe measures the mechanism itself on a planted hot key,
answering the 100 TB question the docstrings assert: how much wall does
the hot reducer cost at this blowup, and does salting remove it?

Fact: ``--rows`` rows (default 4M), ``--keys`` distinct keys (10k),
with one hot key holding ``--hot-frac`` (0.5) of ALL rows — the "one
permno with billions of ticks" shape at local scale.  Generated
map-side from spark.range (no driver data).  Arms:

  agg/plain    groupBy(key).agg(sum,count,max) — ALGEBRAIC: Spark's
               map-side partial aggregation already compresses the hot
               key to one partial per map task, so NO hot reducer
               exists and salting can only lose (this arm measures the
               anti-optimization)
  agg/salted   salted_aggregate on the same algebraic aggs — expected
               SLOWER than plain (extra (key,salt) shuffle buys
               nothing); kept as the documented negative result
  topk/window  per-key top-k via row_number window — the hot key's
               full row set sorts in ONE task
  topk/plain   slice(sort_array(collect_list)) groupBy — partial
               collect_list is unbounded, hot reducer receives the hot
               key's entire value multiset
  topk/salted  salted_aggregate with top-k partials — hot reducer
               input bounded to n_salts x k elements; the case the
               helper exists for
  join/smj     fact ⋈ 10k-row dim as sort-merge (broadcast disabled,
               AQE skew split OFF) — the naive plan: the fact shuffles
               and the hot key's rows land in one merge task
  join/aqe     same with AQE skew split ON (what session defaults give)
  join/salted  salted_broadcast_join — zero fact shuffle, dim exploded
               over the salt space and broadcast

Each arm: warm the plan (limit(1)), then min-of-3 full actions
(bench.py discipline).  Row counts / aggregate sums are cross-checked
between plain and salted arms every run — a probe that broke semantics
would report it loudly.

Usage: python tools/scale_probe_skew.py [--rows 4000000] [--keys 10000]
       [--hot-frac 0.5] [--salts 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from financial_data_science_spark.session import get_spark  # noqa: E402
from financial_data_science_spark.operators.skew import (  # noqa: E402
    salted_aggregate,
    salted_broadcast_join,
)


def timeit(df, n_runs: int = 3) -> tuple[float, int]:
    df.limit(1).count()  # compile/warm the plan, don't time planning
    walls, n = [], 0
    for _ in range(n_runs):
        t0 = time.time()
        n = df.count()
        walls.append(time.time() - t0)
    return min(walls), n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--keys", type=int, default=10_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--salts", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark()
    # planted skew, map-side: the first hot_frac of row ids all map to
    # key 0; the rest spread uniformly over the remaining keyspace
    hot_rows = int(args.rows * args.hot_frac)
    fact = (
        spark.range(args.rows)
        .withColumn(
            "k",
            F.when(F.col("id") < hot_rows, F.lit(0)).otherwise(
                (F.pmod(F.hash("id"), F.lit(args.keys - 1)) + 1).cast("long")
            ),
        )
        .withColumn("x", (F.pmod(F.hash("id", F.lit(1)), F.lit(1000))).cast("double"))
        .localCheckpoint(eager=True)  # freeze inputs so every arm reads the same rows
    )
    print(
        f"SKEW-PROBE fact rows={args.rows} keys={args.keys} "
        f"hot_frac={args.hot_frac} (hot key holds {hot_rows} rows) "
        f"salts={args.salts}",
        flush=True,
    )

    # --- aggregation arms ------------------------------------------------
    plain_agg = fact.groupBy("k").agg(
        F.sum("x").alias("sx"), F.count("*").alias("n"), F.max("x").alias("mx")
    )
    salted_agg = salted_aggregate(
        fact,
        "k",
        partial_aggs={
            "sx": F.sum("x"),
            "n": F.count("*"),
            "mx": F.max("x"),
        },
        merge_aggs={
            "sx": F.sum("sx"),
            "n": F.sum("n"),
            "mx": F.max("mx"),
        },
        n_salts=args.salts,
    )
    w_plain, n_plain = timeit(plain_agg)
    w_salted, n_salted = timeit(salted_agg)
    chk = (
        plain_agg.select(
            F.sum("sx").alias("a"), F.sum("n").alias("b"), F.max("mx").alias("c")
        )
        .collect()[0]
    )
    chk2 = (
        salted_agg.select(
            F.sum("sx").alias("a"), F.sum("n").alias("b"), F.max("mx").alias("c")
        )
        .collect()[0]
    )
    same = (
        n_plain == n_salted
        and abs(chk["a"] - chk2["a"]) < 1e-6 * max(1.0, abs(chk["a"]))
        and chk["b"] == chk2["b"]
        and chk["c"] == chk2["c"]
    )
    print(
        f"SKEW-PROBE agg  plain={w_plain:.2f}s salted={w_salted:.2f}s "
        f"speedup={w_plain / w_salted:.2f}x groups={n_plain} "
        f"values_match={same}",
        flush=True,
    )

    # --- top-k arms (holistic-but-mergeable: where salting matters) ------
    TOPK = 10
    from pyspark.sql import Window

    w_rank = Window.partitionBy("k").orderBy(F.col("x").desc(), F.col("id"))
    topk_window = (
        fact.withColumn("__rn__", F.row_number().over(w_rank))
        .filter(F.col("__rn__") <= TOPK)
        .groupBy("k")
        .agg(F.sort_array(F.collect_list("x"), False).alias("top"))
    )
    topk_plain = fact.groupBy("k").agg(
        F.slice(F.sort_array(F.collect_list("x"), False), 1, TOPK).alias("top")
    )
    topk_salted = salted_aggregate(
        fact,
        "k",
        partial_aggs={
            "top": F.slice(F.sort_array(F.collect_list("x"), False), 1, TOPK)
        },
        merge_aggs={
            "top": F.slice(
                F.sort_array(F.flatten(F.collect_list("top")), False), 1, TOPK
            )
        },
        n_salts=args.salts,
    )
    w_tw, n_tw = timeit(topk_window)
    w_tp, n_tp = timeit(topk_plain)
    w_ts, n_ts = timeit(topk_salted)
    # value cross-check: the top-k VALUE multiset per key is unique even
    # under ties, so exact frame equality is well-defined
    diff = (
        topk_plain.withColumnRenamed("top", "tp")
        .join(topk_salted.withColumnRenamed("top", "ts"), "k")
        .filter(F.col("tp") != F.col("ts"))
        .count()
    )
    print(
        f"SKEW-PROBE topk window={w_tw:.2f}s plain_collect={w_tp:.2f}s "
        f"salted={w_ts:.2f}s speedup_vs_window={w_tw / w_ts:.2f}x "
        f"speedup_vs_plain={w_tp / w_ts:.2f}x groups={n_tw}/{n_tp}/{n_ts} "
        f"value_mismatches={diff}",
        flush=True,
    )

    # --- join arms -------------------------------------------------------
    dim = (
        spark.range(args.keys)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .localCheckpoint(eager=True)
    )
    joined_cols = lambda d: d.select("k", "x", "v")  # noqa: E731

    def with_conf(pairs, thunk):
        saved = {k: spark.conf.get(k, None) for k, _ in pairs}
        for k, v in pairs:
            spark.conf.set(k, v)
        try:
            return thunk()
        finally:
            for k, old in saved.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)

    smj_off = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.skewJoin.enabled", "false"),
    ]
    smj_aqe = [("spark.sql.autoBroadcastJoinThreshold", "-1")]
    w_smj, n_smj = with_conf(
        smj_off, lambda: timeit(joined_cols(fact.join(dim, "k")))
    )
    w_aqe, n_aqe = with_conf(
        smj_aqe, lambda: timeit(joined_cols(fact.join(dim, "k")))
    )
    w_sal, n_sal = timeit(
        joined_cols(salted_broadcast_join(fact, dim, "k", n_salts=args.salts))
    )
    print(
        f"SKEW-PROBE join smj={w_smj:.2f}s aqe_skew={w_aqe:.2f}s "
        f"salted_bcast={w_sal:.2f}s rows {n_smj}/{n_aqe}/{n_sal} "
        f"rows_match={n_smj == n_aqe == n_sal}",
        flush=True,
    )
    return 0 if same and diff == 0 and n_smj == n_aqe == n_sal else 1


if __name__ == "__main__":
    raise SystemExit(main())
