"""Time a named subset of bench entries (catalog Q names or bench.py
EXTRA production twins) on the bench session config — the per-change
feedback loop bench.py is too slow for.

    python tools/bench_some.py contamination_overlap corpus_curation_pipeline_v3

Env: SPARK_GRAFT_SF_DIR (default sf0.1), BENCH_SOME_RUNS (default 3).
Prints one JSON line {name: [runs...]} plus the steal stamp.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def main() -> None:
    names = sys.argv[1:]
    n_runs = int(os.environ.get("BENCH_SOME_RUNS", "3"))
    from bench import EXTRA

    from financial_data_science_spark import get_spark
    from financial_data_science_spark.queries import Q
    from financial_data_science_spark.sources.testdata import load_tables

    spark = get_spark("bench_some")
    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()

    s0, w0 = _steal(), time.time()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = EXTRA.get(name) or Q[name]
        # count once up front so the summary line is well-defined (and
        # identical) regardless of BENCH_SOME_RUNS, including 0
        n = fn(spark, SF_DIR).count()
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            fn(spark, SF_DIR).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(f"# {name}: {runs} ({n} rows)", file=sys.stderr)
    steal_pct = round(100.0 * (_steal() - s0) * 0.01 / max(time.time() - w0, 1e-9), 2)
    print(json.dumps({"runs": out, "cpu_steal_pct_of_wall": steal_pct, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
