"""Interleaved A/B of curation_v3_production variants with per-run
steal stamps — the only trustworthy reading in the bursty-steal regime
(average steal under-detects 100s bursts; each timed run gets its own
/proc/stat delta and is discarded if its OWN window was contended).

A = committed twin (git show HEAD:bench.py), B = working-tree twin.
Prints one JSON line: per-variant quiet-run lists + mins.
"""
from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("AB_ROUNDS", "6"))
MAX_STEAL_PCT = float(os.environ.get("AB_MAX_STEAL", "3.0"))


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def _load(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_src = subprocess.run(
        ["git", "show", "HEAD:bench.py"], cwd=repo, capture_output=True,
        text=True, check=True).stdout
    old_path = "/tmp/ab_v3_old_bench.py"
    with open(old_path, "w") as f:
        f.write(old_src)

    from financial_data_science_spark import get_spark
    from financial_data_science_spark.sources.testdata import load_tables

    spark = get_spark("ab_v3")
    for df in load_tables(spark, SF_DIR).values():
        df.limit(1).count()

    variants = {
        "A_committed": _load(old_path, "ab_old")._production_curation_v3,
        "B_worktree": _load(os.path.join(repo, "bench.py"),
                            "ab_new")._production_curation_v3,
    }
    from pyspark.sql import functions as F

    quiet: dict[str, list[float]] = {k: [] for k in variants}
    rows: dict[str, int] = {}
    sigs_seen: dict[str, set] = {k: set() for k in variants}
    attempts = 0
    while (min(len(v) for v in quiet.values()) < ROUNDS
           and attempts < ROUNDS * 8):
        attempts += 1
        for name, fn in variants.items():
            s0, t0 = _steal(), time.time()
            rows[name] = fn(spark, SF_DIR).count()
            dt = time.time() - t0
            stl = 100.0 * (_steal() - s0) * 0.01 / dt
            if stl < MAX_STEAL_PCT:
                quiet[name].append(round(dt, 3))
            print(f"# {name}: {dt:.2f}s steal {stl:.1f}% "
                  f"{'KEPT' if stl < MAX_STEAL_PCT else 'drop'}",
                  file=sys.stderr, flush=True)
            # content signature, untimed, EVERY round: (count, sum of
            # row hashes) — catches both a variant that swaps WHICH
            # rows survive (same count) and NONDETERMINISTIC survival
            # across executions (the multi-sample guarantee a single
            # end-of-run signature would lose)
            df = fn(spark, SF_DIR)
            sig = df.select(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.xxhash64(*df.columns)).alias("x"),
            ).collect()[0]
            sigs_seen[name].add((sig["n"], sig["x"]))
    assert all(len(v) == 1 for v in sigs_seen.values()), (
        f"nondeterministic content within a variant: {sigs_seen}")
    assert len(set(map(frozenset, sigs_seen.values()))) == 1, (
        f"content-signature mismatch across variants: {sigs_seen}")
    print(json.dumps({
        "quiet_runs": quiet,
        "min": {k: (min(v) if v else None) for k, v in quiet.items()},
        "rows": rows,
        "sf_dir": SF_DIR,
    }))


if __name__ == "__main__":
    main()
