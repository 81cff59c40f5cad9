"""Time a named subset of bench entries with bench-v3 SEMANTICS (build
the DataFrame once untimed, one untimed warmup count, then timed counts
against the same analyzed plan) and a PER-RUN /proc/stat steal stamp —
the r15 feedback loop for kernels whose build legs carry eager
checkpoints (tools/bench_some.py rebuilds per run, charging the timed
region for index construction these entries declare untimed).

    python tools/time_entries.py semdedup_pool_probe semdedup_index_probe

Env: SPARK_GRAFT_SF_DIR (default sf0.1), TIME_ENTRIES_RUNS (default 5).
Prints one JSON line: {name: {"runs": [...], "steal": [...], "min_quiet":
s-or-null, "rows": n, "build": s, "warmup": s}} — min_quiet is the min
over runs whose OWN window stayed under TIME_ENTRIES_MAX_STEAL (3%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("TIME_ENTRIES_RUNS", "5"))
MAX_STEAL = float(os.environ.get("TIME_ENTRIES_MAX_STEAL", "3.0"))


def _steal() -> int:
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except Exception:
        return 0


def main() -> None:
    names = sys.argv[1:]
    from bench import EXTRA

    from financial_data_science_spark import get_spark
    from financial_data_science_spark.queries import Q
    from financial_data_science_spark.sources.testdata import load_tables

    spark = get_spark("time_entries")
    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = EXTRA.get(name) or Q[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        build = time.time() - t0
        t0 = time.time()
        rows = df.count()
        warmup = time.time() - t0
        runs, steals = [], []
        for _ in range(N_RUNS):
            s0, t0 = _steal(), time.time()
            df.count()
            dt = time.time() - t0
            runs.append(round(dt, 3))
            steals.append(round(100.0 * (_steal() - s0) * 0.01 / dt, 1))
        quiet = [r for r, s in zip(runs, steals) if s < MAX_STEAL]
        out[name] = {
            "runs": runs,
            "steal": steals,
            "min_quiet": min(quiet) if quiet else None,
            "rows": rows,
            "build": round(build, 3),
            "warmup": round(warmup, 3),
        }
        print(f"# {name}: min_quiet={out[name]['min_quiet']} runs={runs} "
              f"steal={steals} rows={rows} build={build:.2f}",
              file=sys.stderr, flush=True)
    print(json.dumps({"entries": out, "sf_dir": SF_DIR}))


if __name__ == "__main__":
    main()
