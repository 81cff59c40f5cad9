"""Markdown comparison of the current BENCH_DETAIL.json against prior
round records — the per-query evidence table SCALE.md cites.

Usage: python tools/bench_compare.py [--baseline tools/bench_r9_pre_quiet_detail.json]
Prints per-query min-of-runs for baseline vs current, the ratio, and
flags |ratio-1| >= 15%.  Reads steal stamps so the table is honest
about record quality.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _mins(path: str) -> tuple[dict, float]:
    with open(path) as f:
        d = json.load(f)
    return (
        {k: min(v) for k, v in d["runs"].items() if v},
        d.get("cpu_steal_pct_of_wall", -1.0),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--baseline",
        default=os.path.join(REPO, "tools/bench_r9_pre_quiet_detail.json"),
    )
    ap.add_argument(
        "--current", default=os.path.join(REPO, "BENCH_DETAIL.json")
    )
    args = ap.parse_args()
    base, bsteal = _mins(args.baseline)
    cur, csteal = _mins(args.current)
    print(f"| query | {os.path.basename(args.baseline)} "
          f"(steal {bsteal}%) | current (steal {csteal}%) | ratio |")
    print("|---|---|---|---|")
    tot_b = tot_c = 0.0
    for k in cur:
        c = cur[k]
        b = base.get(k)
        if b is None:
            print(f"| {k} | — | {c:.3f}s | new |")
            continue
        tot_b += b
        tot_c += c
        r = c / b
        flag = " **" + ("faster" if r < 1 else "slower") + "**" \
            if abs(r - 1) >= 0.15 else ""
        print(f"| {k} | {b:.3f}s | {c:.3f}s | {r:.2f}x{flag} |")
    if tot_b:
        print(f"| **shared-query total** | {tot_b:.1f}s | {tot_c:.1f}s "
              f"| {tot_c / tot_b:.2f}x |")


if __name__ == "__main__":
    main()
