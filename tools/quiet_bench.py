"""Quiet-window watcher: run bench.py only when the box is calm, keep
only a <5%-steal record.

Loop: 5s busy-probe (process_time vs wall — catches hypervisor steal
AND local contention); if quiet, take /tmp/benchlock, run bench.py,
read the recorded /proc/stat steal from BENCH_DETAIL.json; keep the
record and exit if <5%, else restore the committed record and keep
waiting.  Writes the accepted one-line record to
tools/quiet_bench_accepted.json.

Run: PYTHONPATH=/root/repo python tools/quiet_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOCK = "/tmp/benchlock"
PROBE_QUIET_PCT = 3.0
RECORD_MAX_STEAL = 5.0
MAX_WAIT_SEC = int(os.environ.get("QUIET_BENCH_MAX_WAIT", "14400"))


def probe(seconds: float = 5.0) -> float:
    t0, c0 = time.time(), time.process_time()
    while time.time() - t0 < seconds:
        pass
    w, c = time.time() - t0, time.process_time() - c0
    return 100.0 * (1.0 - c / w)


def main() -> None:
    t_start = time.time()
    attempt = 0
    while time.time() - t_start < MAX_WAIT_SEC:
        p = probe()
        if p > PROBE_QUIET_PCT:
            print(f"[watch] contended ({p:.1f}%), sleeping 120s", flush=True)
            time.sleep(120)
            continue
        attempt += 1
        print(f"[watch] quiet probe ({p:.1f}%), bench attempt {attempt}",
              flush=True)
        open(LOCK, "w").write(str(os.getpid()))
        try:
            r = subprocess.run(
                [sys.executable, "bench.py"], cwd=REPO, timeout=900,
                capture_output=True, text=True,
            )
        finally:
            os.unlink(LOCK)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            detail = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
            steal = detail.get("cpu_steal_pct_of_wall", 100.0)
        except Exception:
            steal = 100.0
        print(f"[watch] attempt {attempt}: recorded steal {steal}%", flush=True)
        if steal < RECORD_MAX_STEAL and line.startswith("{"):
            with open(os.path.join(REPO, "tools/quiet_bench_accepted.json"),
                      "w") as f:
                f.write(line)
            print("[watch] ACCEPTED — record kept; headline line saved",
                  flush=True)
            return
        subprocess.run(["git", "checkout", "--", "BENCH_DETAIL.json"],
                       cwd=REPO)
        print("[watch] rejected (contended) — committed record restored",
              flush=True)
        time.sleep(60)
    print("[watch] gave up: no quiet window", flush=True)


if __name__ == "__main__":
    main()
