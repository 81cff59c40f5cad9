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

CANARIES = ["asof_join_backward", "text_quality", "q1_pricing_summary"]

# primary kernel modules per canary; the query function's own source is
# always hashed (robust to unrelated queries.py churn), these files are
# the operator implementations the query leans on
CANARY_SOURCE_FILES = {
    "asof_join_backward": ["financial_data_science_spark/operators/asof.py"],
    "text_quality": ["financial_data_science_spark/functions/text.py"],
    "q1_pricing_summary": [],
}


def canary_source_hashes() -> dict[str, str]:
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from financial_data_science_spark.queries import Q

    out = {}
    for name in CANARIES:
        h = hashlib.sha256()
        h.update(inspect.getsource(Q[name]).encode())
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
