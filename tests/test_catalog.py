"""Catalog invariants: every query has an oracle (rows-only is extinct)
and the driver-gate prefix matches the round-5 curated coverage set."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_query_has_an_oracle():
    from financial_data_science_spark.queries import ORACLE, Q

    missing = set(Q) - set(ORACLE)
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"
    stray = set(ORACLE) - set(Q)
    assert not stray, f"oracles without a query: {sorted(stray)}"


def test_gate_prefix_is_pinned():
    """The driver checks the first 50 queries() entries; the round-9
    curation must stay stable (registration-order drift would silently
    swap which queries earn driver rows), must keep the flagship + the
    r9 debut row (the only catalog entry with no driver CORRECTNESS
    record), and must draw the rest from the oldest-driver-checked
    cohorts (refresh rotation: ALL 8 r5-stale rows, then r6)."""
    from financial_data_science_spark.queries import _GATE_ORDER, Q

    assert len(_GATE_ORDER) == 50
    assert list(Q)[:50] == _GATE_ORDER
    required = {
        # anchor
        "universe_assembly",
        # r9 debut row: built this round, first-ever driver record
        "stream_ann_top1_production",
        # the full r5-stale cohort (deferred once in r8 — must not
        # reach 4 rounds without an official record)
        "coercion_roundtrip", "dedup_canonical_keep",
        "lapsed_supplier_parts", "max_drawdown_windows",
        "outlier_fences_tukey", "parametric_risk_summary",
        "stream_session_windows", "stream_tick_bins_5min",
        # r6-cohort representatives across kernel families
        "ann_ivf_topk", "ann_sq8_topk", "asof_join_backward",
        "embedding_near_dups", "hard_negative_mining",
        "stream_static_enrich", "supply_closeness",
        "csv_load_coercion", "contamination_overlap",
    }
    assert required <= set(_GATE_ORDER)
    # every catalog query has at least one recorded driver round OR is
    # in this round's gate (the refresh rotation keeps the oldest
    # evidence bounded): union(r1..rN records, round-8 gate) covers Q
    pending_first_driver_row = set()
    import glob
    checked = set(_GATE_ORDER) | pending_first_driver_row
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        with open(f) as fh:
            checked |= set(json.load(fh))
    assert set(Q) <= checked, sorted(set(Q) - checked)


def test_entry_contract_shape():
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert callable(E.entry)
    assert set(o) <= set(q)
    assert len(q) >= 85
