"""Shared helpers for the sealed bench floor (tools/bench_v3_floor.json).

The floor is ONE low-steal bench record, sealed by tools/seal_floor.py,
that quiet_bench.py certifies every later record against: three drift
CANARIES must individually land within CANARY_MAX_RATIO of their floor
values, and every other shared query gets a ratio in the accepted
record's floor table (warn-not-reject — burst odds scale with query
count, so a single >1.35x row is flagged for investigation rather than
vetoing the record).

Staleness guard (r10 advisor): the floor embeds a content hash of each
canary's query-function source plus its primary kernel module files.
quiet_bench recomputes them at startup and refuses to certify against a
floor whose canary kernels have since been edited — re-seal instead of
silently grading drifted code against stale numbers.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_PATH = os.path.join(REPO, "tools", "bench_v3_floor.json")

# Seven canaries in two weight classes.  The original three became
# 57-266ms under v3 plan-reuse timing, where a 1.15x ratio gate is
# 13-40ms — scheduler-jitter territory on a shared box (a 0.75%-steal
# attempt was observed failing on a 19ms excess).  The HEAVY canaries
# (~0.7-2.1s at the sealed floor) carry the burst detection the gate
# exists for: a 1.2-1.6x drift burst moves them by 150-900ms, far above
# jitter.  The tiny three keep their ratio gate but gain an absolute
# slack (quiet_bench CANARY_ABS_SLACK, default 30ms ~= 1-2 scheduler
# quanta) so sub-quantum differences on sub-300ms kernels stop
# masquerading as drift.
#
# r12: two EXTENDED-SECTION canaries added (ann_ivfpq_topk 0.897s,
# embedding_near_dups 2.109s at the r11 floor) — the r11 record
# investigation showed the extended section drifts independently of the
# headline canaries, so certification previously covered it only by
# proxy.  Both are timed late in the bench run, bracketing the session
# phase the headline canaries never see.
CANARIES = [
    "asof_join_backward",
    "text_quality",
    "q1_pricing_summary",
    "event_window_trading_days",
    "minhash_lsh_production",
    "ann_ivfpq_topk",
    "embedding_near_dups",
]

# primary kernel modules per canary; the query function's own source is
# always hashed (robust to unrelated queries.py churn), these files are
# the operator implementations the query leans on
CANARY_SOURCE_FILES = {
    "asof_join_backward": ["financial_data_science_spark/operators/asof.py"],
    "text_quality": ["financial_data_science_spark/functions/text.py"],
    "q1_pricing_summary": [],
    "event_window_trading_days": [
        "financial_data_science_spark/operators/events.py",
        "financial_data_science_spark/plans/calendar.py",
    ],
    "minhash_lsh_production": [
        "financial_data_science_spark/functions/similarity.py",
    ],
    "ann_ivfpq_topk": [
        "financial_data_science_spark/functions/similarity.py",
    ],
    "embedding_near_dups": [
        "financial_data_science_spark/functions/similarity.py",
    ],
}


def canary_source_hashes() -> dict[str, str]:
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    import bench
    from financial_data_science_spark.queries import Q

    out = {}
    for name in CANARIES:
        fn = bench.EXTRA.get(name) or Q[name]
        h = hashlib.sha256()
        h.update(inspect.getsource(fn).encode())
        for rel in CANARY_SOURCE_FILES[name]:
            with open(os.path.join(REPO, rel), "rb") as f:
                h.update(f.read())
        out[name] = h.hexdigest()[:16]
    return out


def load_floor() -> dict:
    with open(FLOOR_PATH) as f:
        return json.load(f)


def flat_query_times(record: dict) -> dict[str, float]:
    """All per-query mins of a bench record, across the headline,
    oracle-path, and extended blocks."""
    out: dict[str, float] = {}
    for block in ("queries", "oracle_path", "extended"):
        out.update(record.get(block) or {})
    return out


def floor_ratio_table(record: dict, floor: dict) -> dict[str, float]:
    """observed/floor per query shared between a record and the floor."""
    obs, ref = flat_query_times(record), flat_query_times(floor)
    return {
        name: round(obs[name] / ref[name], 3)
        for name in sorted(set(obs) & set(ref))
        if ref[name] > 0
    }
