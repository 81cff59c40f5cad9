"""Quiet-window watcher: run bench.py only when the box is calm, keep
only a record that is BOTH low-steal and drift-free.

Loop: 5s busy-probe (process_time vs wall — catches hypervisor steal
AND local contention); if quiet, take /tmp/benchlock, run bench.py,
read the recorded /proc/stat steal from BENCH_DETAIL.json AND compare
the drift canaries — pinned never-touched queries — against the sealed
quiet floor (tools/bench_v3_floor.json, written by tools/seal_floor.py).
Keep the record and exit only if steal < 5% and the canary panel
certifies the window.  The panel logic leans on one structural fact:
canary kernels are SOURCE-HASH-PINNED (the gate refuses to start if
any changed since sealing), so a canary's wall time can only move with
the BOX — the panel is a pure environment sensor, and the drift it
exists to catch (the r9 failure: untouched queries 1.2-1.5x) is
CORRELATED inflation.  Certification therefore requires:

  1. each HEAVY canary (floor >= 0.5s, where 1.15x is 100-230ms — far
     above scheduler jitter) within CANARY_MAX_RATIO of its floor;
  2. the MEDIAN of all five canary ratios within CANARY_MAX_RATIO
     (a burst inflates most of the panel; jitter moves one member);
  3. no canary above CANARY_HARD_CAP (a wildly-off reading, even a
     jitter-class one, means an uncertifiable window).

A single sub-300ms canary running tens of ms over its floor while the
heavies sit at ~1.0x is scheduler noise, not drift, and no longer
vetoes a record; per-query regressions in CODE are caught by the full
floor-ratio table below (and cannot occur in the canaries themselves,
whose kernels are hash-verified unchanged).  On rejection the pre-run
BENCH_DETAIL.json bytes are restored and the watch continues.

Why the canary (r9 verdict): run-average steal under-detects 100-second
steal BURSTS — the r9 accepted record passed at 2.33% average steal yet
its untouched tiny queries ran 1.2-1.5x above the then-floor.  A canary
that must individually land in-band rejects exactly those records;
min-of-N per query cannot dodge bursts that outnumber runs.

Beyond the canaries (r10 verdict item 3): the accepted record carries
the FULL per-query ratio table vs the sealed floor — worst-5 offenders
plus every row over WARN_RATIO — so a non-canary regression is visible
in the record instead of indistinguishable from drift.  Those rows WARN
rather than reject (burst odds scale with query count); each must be
either code-untouched (named as drift) or investigated.

Staleness guard (r10 advisor): refuses to start if a canary kernel's
source no longer hashes to what the floor sealed — re-seal with
tools/seal_floor.py instead of certifying against stale numbers.

Writes the accepted one-line record (with canary ratios and the floor
table embedded) to tools/quiet_bench_accepted.json.  If no attempt
passes before MAX_WAIT, the best steal-ok attempt (smallest worst-canary
ratio) is saved to tools/quiet_bench_best_rejected.json for diagnostics
— it is NOT a certified record.

Run: PYTHONPATH=/root/repo python tools/quiet_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from floorlib import (  # noqa: E402
    CANARIES,
    REPO,
    canary_source_hashes,
    flat_query_times,
    floor_ratio_table,
    load_floor,
)

LOCK = "/tmp/benchlock"
PROBE_QUIET_PCT = 3.0
RECORD_MAX_STEAL = 5.0
MAX_WAIT_SEC = int(os.environ.get("QUIET_BENCH_MAX_WAIT", "14400"))
CANARY_MAX_RATIO = float(os.environ.get("QUIET_BENCH_CANARY_MAX", "1.15"))
# panel thresholds (see module docstring for the certification logic)
CANARY_HARD_CAP = float(os.environ.get("QUIET_BENCH_CANARY_CAP", "1.5"))
HEAVY_CANARY_FLOOR_SEC = 0.5
WARN_RATIO = float(os.environ.get("QUIET_BENCH_WARN_RATIO", "1.35"))


def probe(seconds: float = 5.0) -> float:
    t0, c0 = time.time(), time.process_time()
    while time.time() - t0 < seconds:
        pass
    w, c = time.time() - t0, time.process_time() - c0
    return 100.0 * (1.0 - c / w)


def canary_ratios(record: dict, floor: dict) -> dict[str, float]:
    """Per-canary observed/floor ratio, pulled from the record itself
    (the canaries were just timed under exactly the conditions being
    certified).  r12: canaries live in the headline AND extended
    sections (the extended section drifts independently — r11 record
    investigation), so both are resolved through the flat view."""
    obs_all, ref_all = flat_query_times(record), flat_query_times(floor)
    out = {}
    for name in CANARIES:
        obs, ref = obs_all.get(name), ref_all.get(name)
        out[name] = (
            round(obs / ref, 3) if obs is not None and ref else float("inf")
        )
    return out


def panel_certifies(record: dict, floor: dict) -> tuple[bool, dict]:
    """The three-part panel check from the module docstring: heavy
    canaries individually in-band, panel median in-band, nothing above
    the hard cap.  Returns (certified, diagnostics)."""
    ratios = canary_ratios(record, floor)
    vals = sorted(ratios.values())
    median = vals[len(vals) // 2] if len(vals) % 2 else round(
        (vals[len(vals) // 2 - 1] + vals[len(vals) // 2]) / 2, 3)
    floor_flat = flat_query_times(floor)
    heavy = {
        n: r for n, r in ratios.items()
        if (floor_flat.get(n) or 0) >= HEAVY_CANARY_FLOOR_SEC
    }
    diag = {
        "ratios": ratios,
        "median": median,
        "heavy": heavy,
        "max": max(vals) if vals else float("inf"),
    }
    ok = (
        bool(heavy)
        and all(r <= CANARY_MAX_RATIO for r in heavy.values())
        and median <= CANARY_MAX_RATIO
        and diag["max"] <= CANARY_HARD_CAP
    )
    return ok, diag


def main() -> None:
    floor = load_floor()
    sealed = floor.get("canary_source_hashes", {})
    current = canary_source_hashes()
    if sealed != current:
        drifted = [k for k in current if sealed.get(k) != current[k]]
        print(f"[watch] FATAL: canary kernel source changed since the "
              f"floor was sealed ({drifted}) — re-seal with "
              f"tools/seal_floor.py before certifying records", flush=True)
        sys.exit(2)
    # a timing-semantics bump without a re-seal would grade v_N records
    # against a v_{N-1} floor — same stale-floor failure mode
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import bench

    if floor.get("bench_set_version") != bench.BENCH_SET_VERSION:
        print(f"[watch] FATAL: floor sealed at bench_set_version "
              f"{floor.get('bench_set_version')} but bench.py is at "
              f"{bench.BENCH_SET_VERSION} — re-seal with "
              f"tools/seal_floor.py", flush=True)
        sys.exit(2)

    t_start = time.time()
    attempt = 0
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    best: dict | None = None  # steal-ok but canary-rejected, smallest worst-ratio
    while time.time() - t_start < MAX_WAIT_SEC:
        p = probe()
        if p > PROBE_QUIET_PCT:
            print(f"[watch] contended ({p:.1f}%), sleeping 120s", flush=True)
            time.sleep(120)
            continue
        attempt += 1
        print(f"[watch] quiet probe ({p:.1f}%), bench attempt {attempt}",
              flush=True)
        # snapshot the pre-run BENCH_DETAIL bytes so a rejected attempt
        # restores exactly what was there (NOT the committed version —
        # the working tree may hold newer uncommitted state)
        try:
            with open(detail_path, "rb") as f:
                detail_snapshot = f.read()
        except OSError:
            detail_snapshot = None

        def restore_snapshot() -> None:
            if detail_snapshot is not None:
                with open(detail_path, "wb") as f:
                    f.write(detail_snapshot)
            elif os.path.exists(detail_path):
                os.unlink(detail_path)

        open(LOCK, "w").write(str(os.getpid()))
        try:
            # pin the detail path for the subprocess to the SAME file
            # this watcher reads its steal stamp from — an inherited
            # SPARK_GRAFT_BENCH_DETAIL_PATH would otherwise send the
            # fresh detail elsewhere and the gate would certify against
            # the stale committed record
            env = dict(os.environ,
                       SPARK_GRAFT_BENCH_DETAIL_PATH=detail_path)
            r = subprocess.run(
                [sys.executable, "bench.py"], cwd=REPO, timeout=900,
                capture_output=True, text=True, env=env,
            )
        except subprocess.TimeoutExpired:
            # a timed-out bench may have part-written the detail file;
            # put the pre-run bytes back and keep watching instead of
            # crashing out of the loop
            restore_snapshot()
            print("[watch] bench timed out (900s) — pre-run BENCH_DETAIL "
                  "restored, continuing", flush=True)
            time.sleep(60)
            continue
        finally:
            os.unlink(LOCK)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        try:
            detail = json.load(open(detail_path))
            steal = detail.get("cpu_steal_pct_of_wall", 100.0)
        except Exception:
            steal = 100.0
        record = None
        if line.startswith("{"):
            try:
                record = json.loads(line)
            except ValueError:
                record = None
        if record is not None:
            certified, diag = panel_certifies(record, floor)
            ratios, worst = diag["ratios"], diag["max"]
        else:
            certified, diag, ratios, worst = False, {}, {}, float("inf")
        print(f"[watch] attempt {attempt}: steal {steal}%, panel {diag}",
              flush=True)
        if record is not None and steal < RECORD_MAX_STEAL:
            if certified:
                record["canary_ratios"] = ratios
                record["canary_panel"] = {
                    "median": diag["median"], "heavy": diag["heavy"],
                    "max_ratio": CANARY_MAX_RATIO,
                    "hard_cap": CANARY_HARD_CAP,
                }
                # the full drift table vs the sealed floor: worst-5 plus
                # every row above WARN_RATIO (warn, not reject)
                table = floor_ratio_table(record, floor)
                worst5 = dict(sorted(table.items(), key=lambda kv: -kv[1])[:5])
                over = {k: v for k, v in table.items() if v > WARN_RATIO}
                record["floor_ratios_worst5"] = worst5
                record["floor_warn_over"] = {"ratio": WARN_RATIO, **over}
                record["floor_sealed_at"] = floor.get("sealed_at_commit")
                if over:
                    print(f"[watch] WARN: {len(over)} shared queries over "
                          f"{WARN_RATIO}x the sealed floor: {over} — each "
                          f"must be code-untouched (drift) or investigated",
                          flush=True)
                with open(os.path.join(REPO,
                                       "tools/quiet_bench_accepted.json"),
                          "w") as f:
                    f.write(json.dumps(record, separators=(",", ":")))
                print("[watch] ACCEPTED — steal and canaries in-band; "
                      "record kept", flush=True)
                return
            if best is None or worst < best["worst_canary"]:
                best = {"record": record, "canary_ratios": ratios,
                        "worst_canary": worst, "steal": steal,
                        "detail": detail}
        # rejected: put back the pre-run detail bytes
        restore_snapshot()
        print("[watch] rejected (steal or canary drift) — pre-run "
              "BENCH_DETAIL restored", flush=True)
        time.sleep(60)
    if best is not None:
        with open(os.path.join(REPO,
                               "tools/quiet_bench_best_rejected.json"),
                  "w") as f:
            json.dump(best, f)
        print(f"[watch] gave up: best steal-ok attempt had worst canary "
              f"{best['worst_canary']}x (saved for diagnostics, NOT "
              f"certified)", flush=True)
    else:
        print("[watch] gave up: no quiet window", flush=True)


if __name__ == "__main__":
    main()
