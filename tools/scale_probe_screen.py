"""Three-way contamination-screen kernel shoot-out (r9, VERDICT item 5).

Times the membership kernel of the curation screen at the 50k-doc
probe (sf0.1 documents) against TWO benchmark-suite sizes:

- pandas  : mapInPandas frozenset probe  (O(grams)/doc, interpreted)
- overlap : JVM arrays_overlap vs broadcast 1-row array (O(|bench|)/doc
            once |bench| > grams/doc — Spark builds the hash set from
            the SMALLER array and probes with the LARGER)
- join    : batch-only explode -> broadcast left-semi -> left anti
            (O(grams)/doc, JVM hash probes; not streaming-composable)

All three are parity-checked (identical kept doc_id sets) before
timing.  Run: PYTHONPATH=/root/repo python tools/scale_probe_screen.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from financial_data_science_spark.functions.pipeline import (
    contamination_screen,
    contamination_screen_join,
    ngram_hashes,
)
from financial_data_science_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _steal0():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]), sum(int(x) for x in parts[1:])


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
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    mult = int(os.environ.get("PROBE_MULT", "1"))
    if mult > 1:
        # suffix-tagged copies: cross-copy grams never collide, so the
        # contamination structure scales exactly mult-x (pipeline-probe
        # trick); the benchmark suite is drawn from copy 0 only
        c = docs.withColumn(
            "copy", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        )
        tagged = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, F.lit("_"), F.col("copy")),
            ),
            " ",
        )
        docs = c.select(
            (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
            tagged.alias("text"),
        )
    docs = docs.localCheckpoint(eager=True)  # take the scan out of the loop
    n_docs = docs.count()

    s0, t0 = _steal0()
    for label, mod in (("large-suite(1/17 docs)", 17), ("small-suite(1/1000 docs)", 1000)):
        bench = [
            r["__h__"]
            for r in docs.filter(F.col("doc_id") % mod == 0)
            .select(F.explode(ngram_hashes(F.col("text"), 5, False)).alias("__h__"))
            .distinct()
            .collect()
        ]
        print(f"== {label}: |bench| = {len(bench):,} grams, {n_docs:,} docs")

        forms = {
            "pandas": lambda: contamination_screen(
                docs, spark, bench, n=5, portable=False, method="pandas"
            ),
            "overlap": lambda: contamination_screen(
                docs, spark, bench, n=5, portable=False, method="overlap"
            ),
            "join": lambda: contamination_screen_join(
                docs, spark, bench, n=5, portable=False
            ),
        }
        kept = {
            k: {r["doc_id"] for r in f().select("doc_id").collect()}
            for k, f in forms.items()
        }
        assert kept["pandas"] == kept["overlap"] == kept["join"], {
            k: len(v) for k, v in kept.items()
        }
        print(f"   parity OK: all three keep {len(kept['pandas']):,} docs")
        for k, f in forms.items():
            runs = []
            for _ in range(3):
                t = time.time()
                f().select("doc_id").count()
                runs.append(round(time.time() - t, 3))
            print(f"   {k:8s}: {runs}  ({n_docs / min(runs):,.0f} docs/s best)")
    s1, t1 = _steal0()
    print(f"steal over probe: {100.0 * (s1 - s0) / max(t1 - t0, 1):.2f}%")
    spark.stop()


if __name__ == "__main__":
    main()
