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
    """The driver checks the first 50 queries() entries; the round-13
    curation must stay stable (registration-order drift would silently
    swap which queries earn driver rows), must keep the flagship + the
    three r13 debut rows (the only catalog entries with no driver
    CORRECTNESS record) + the changed-kernel re-gate, and must draw the
    rest from the oldest-driver-checked cohorts (refresh rotation: ALL
    15 r9-stale rows — the r12 verdict item 1 pinned them by name —
    then 30 of the 49 r10-stale rows, 19 deferred with documented
    justifications)."""
    from financial_data_science_spark.queries import _GATE_ORDER, Q

    assert len(_GATE_ORDER) == 50
    assert list(Q)[:50] == _GATE_ORDER
    required = {
        # anchor
        "universe_assembly",
        # r13 debut rows: built this round, first-ever driver record
        "semdedup_probe_stratified",
        "semdedup_pool_probe",
        "semdedup_pool_probe_capped",
        # changed-kernel re-gate (rank-block pair join landed in r13)
        "semantic_dedup_capped",
        # the full r9-stale cohort (would be 4 rounds stale if deferred;
        # r12 verdict item 1 names all 15, including the
        # token_budget_packing row SCALE.md's r13 pointer miscounted)
        "ann_ivf_topk", "ann_ivfpq_residual", "ann_recall_at_k",
        "asof_join_backward", "bond_portfolio_pricing",
        "corpus_curation_pipeline_v2", "cosupply_clustering",
        "embedding_near_dups", "hard_negative_mining",
        "multimodal_resize", "stream_ann_top1_production",
        "supply_closeness", "supply_hits",
        "supply_personalized_pagerank", "token_budget_packing",
        # the r10 rows the r12 verdict item 2 prioritized (no
        # same-kernel sibling coverage)
        "jaccard_near_dups", "event_window_trading_days",
        "tick_bins_5min", "tw_value_5min", "fractile_deciles",
        "group_ols", "delist_adjusted_compound",
    }
    assert required <= set(_GATE_ORDER)
    # every catalog query has at least one recorded driver round OR is
    # in this round's gate (the refresh rotation keeps the oldest
    # evidence bounded): union(r1..rN records, this gate) covers Q
    pending_first_driver_row = set()
    import glob
    checked = set(_GATE_ORDER) | pending_first_driver_row
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
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
