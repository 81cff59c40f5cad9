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
    """The driver checks the first 50 queries() entries; the round-14
    curation must stay stable (registration-order drift would silently
    swap which queries earn driver rows), must keep the flagship + the
    r14 debut row (the only catalog entry with no driver CORRECTNESS
    record), and must draw the rest from the oldest-driver-checked
    cohorts (refresh rotation: ALL 19 r10-stale rows — the r13 verdict
    item 1 pinned them by name — then 29 of the 49 r11-stale rows, 20
    deferred with documented justifications above _GATE_ORDER)."""
    from financial_data_science_spark.queries import _GATE_ORDER, Q

    assert len(_GATE_ORDER) == 50
    assert list(Q)[:50] == _GATE_ORDER
    required = {
        # anchor
        "universe_assembly",
        # r14 debut row: non-vacuous J15/§2.7 anti-join (r13 verdict
        # item 4 — the un-windowed sibling hash-matches an empty frame)
        "users_click_no_purchase_window",
        # the full r10-stale cohort (would be 4 rounds stale if
        # deferred; r13 verdict item 1 names all 19)
        "ann_ivfpq_refined", "ann_pq_topk", "bpe_segment_tokens",
        "bpe_train_merges", "corpus_curation_pipeline", "cosine_topk",
        "dedup_exact_docs", "hard_negative_mining_ivf",
        "hard_negative_mining_production", "kupiec_var_backtest",
        "multimodal_frame_sample", "near_dup_clusters",
        "stream_minhash_novelty", "supply_assortativity",
        "supply_communities", "supply_graph_degrees",
        "supply_graph_pagerank", "supply_link_prediction",
        "winsorized_price_stats",
        # the r11 rows under active watch protocols (r13 verdict items
        # 3 and What's-wrong 4): both need fresh driver timings
        "q1_pricing_summary", "quality_classifier_irls",
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
