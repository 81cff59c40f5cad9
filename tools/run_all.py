"""One-command repro of every number in README/COVERAGE/SCALE.

Runs, in order:
  1. pytest (the unit/property suite)
  2. the correctness replica (tools/check_correctness.py) at sf0.01
  3. the correctness replica at sf0.1
  4. bench.py at sf0.1 (headline JSON + BENCH_DETAIL.json)

and writes a single summary JSON (tools/run_all_summary.json) plus a
human-readable line per stage.  Any stage failing makes the exit code
nonzero.  Stages can be skipped: ``python tools/run_all.py --skip
pytest,sf01`` (names: pytest, sf001, sf01, bench).

Each stage runs in a SUBPROCESS so Spark sessions don't share JVMs and a
crash in one stage can't poison the next.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env: dict | None = None, timeout: int = 3600) -> dict:
    t0 = time.time()
    full_env = {**os.environ, **(env or {})}
    proc = subprocess.run(
        cmd, cwd=REPO, env=full_env, capture_output=True, text=True,
        timeout=timeout,
    )
    return {
        "cmd": " ".join(cmd),
        "rc": proc.returncode,
        "sec": round(time.time() - t0, 1),
        "stdout_tail": proc.stdout[-2000:],
        "stderr_tail": proc.stderr[-2000:],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: pytest,sf001,sf01,bench")
    ap.add_argument("--sf1", action="store_true",
                    help="also generate /tmp/sf1 and sweep the catalog there")
    args = ap.parse_args()
    skip = {s.strip() for s in args.skip.split(",") if s.strip()}

    summary: dict = {"stages": {}, "ok": True}
    prev_stages: dict = {}
    try:
        with open(os.path.join(REPO, "tools", "run_all_summary.json")) as fh:
            prev_stages = json.load(fh).get("stages", {})
    except (OSError, ValueError):
        pass

    def stage(name: str, cmd: list[str], env: dict | None = None,
              check=None) -> None:
        if name in skip:
            # carry the previous run's real result forward instead of
            # erasing it — a --skip rerun of one stage must not destroy
            # the record of the others (marked so readers can tell)
            prev = prev_stages.get(name)
            if prev and not prev.get("skipped"):
                summary["stages"][name] = {**prev, "carried_forward": True}
                summary["ok"] = summary["ok"] and bool(prev.get("ok"))
                print(f"[run_all] {name}: SKIPPED "
                      f"(carried previous: ok={prev.get('ok')})")
            else:
                summary["stages"][name] = {"skipped": True}
                print(f"[run_all] {name}: SKIPPED")
            return
        r = _run(cmd, env)
        verdict = r["rc"] == 0 and (check is None or check(r))
        summary["stages"][name] = {**r, "ok": verdict}
        summary["ok"] = summary["ok"] and verdict
        print(f"[run_all] {name}: {'OK' if verdict else 'FAIL'} "
              f"({r['sec']}s, rc={r['rc']})")
        if not verdict:
            print(r["stdout_tail"][-800:])
            print(r["stderr_tail"][-800:], file=sys.stderr)

    def all_green(r: dict) -> bool:
        m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", r["stdout_tail"])
        return bool(m) and m.group(2) == "0"

    def bench_parses(r: dict) -> bool:
        for line in reversed(r["stdout_tail"].strip().splitlines()):
            try:
                d = json.loads(line)
                summary["bench_headline"] = d
                return "queries" in d and "value" in d
            except json.JSONDecodeError:
                continue
        return False

    stage("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"])
    stage("sf001", [sys.executable, "tools/check_correctness.py"],
          env={"SPARK_GRAFT_CHECK_SF_DIR": "/root/testdata/sf0.01"},
          check=all_green)
    stage("sf01", [sys.executable, "tools/check_correctness.py"],
          env={"SPARK_GRAFT_CHECK_SF_DIR": "/root/testdata/sf0.1"},
          check=all_green)
    stage("bench", [sys.executable, "bench.py"], check=bench_parses)
    if args.sf1:
        # 100x-the-gate sweep: generate the blowup, then run the full
        # catalog against it, skipping only the two cosupply queries
        # whose DUCKDB ORACLE (not the engine — see SCALE.md) is
        # sf1-bound.  Several hours of wall if run after a cold start.
        stage("sf1_gen", [sys.executable, "tools/blowup_sf.py",
                          "--factor", "10", "--out", "/tmp/sf1"])
        sys.path.insert(0, REPO)
        from financial_data_science_spark.queries import Q

        names = [n for n in Q
                 if n not in ("cosupply_clustering", "cosupply_graph_info")]
        stage("sf1", [sys.executable, "tools/check_correctness.py", *names],
              env={"SPARK_GRAFT_CHECK_SF_DIR": "/tmp/sf1"},
              check=all_green)

    ran_any = any(not v.get("skipped") for v in summary["stages"].values())
    out = os.path.join(REPO, "tools", "run_all_summary.json")
    if ran_any:  # never clobber a real record with an all-skipped run
        with open(out, "w") as fh:
            json.dump(summary, fh, indent=1)
    print(f"[run_all] {'ALL GREEN' if summary['ok'] else 'FAILURES'}"
          f"{' -> ' + out if ran_any else ' (nothing ran; summary not written)'}")
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
