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
    """The driver checks the first 50 queries() entries; the round-15
    curation must stay stable (registration-order drift would silently
    swap which queries earn driver rows), must keep the flagship, must
    take ALL 20 r11-stale rows (the 3-stale ceiling the r14 rotation
    pinned by name), and must cover every kernel the r14/r15
    optimization waves touched (the r14 verdict's item 1 — its one
    assurance gap; exceptions carry same-kernel-sibling justifications
    above _GATE_ORDER)."""
    from financial_data_science_spark.queries import _GATE_ORDER, Q

    assert len(_GATE_ORDER) == 50
    assert list(Q)[:50] == _GATE_ORDER
    required = {
        # anchor
        "universe_assembly",
        # the r11-stale cohort (the resumed r15 session rotated four
        # untouched-kernel rows — compound_by_year,
        # ewma_riskmetrics_vol, ffill_last_error,
        # portfolio_monthly_returns — out to 4-stale in favor of the
        # queries whose bodies it changed; see the amendment note above
        # _GATE_ORDER)
        "car_by_relative_day",
        "corpus_curation_pipeline_v3", "cosine_ann_bucketed",
        "dedup_keep_last", "doc_chunking",
        "minhash_index_increment",
        "minhash_lsh_stopshingle", "month_end_trading_days",
        "prevailing_click_at_purchase",
        "repetition_quality", "semantic_dedup", "smoothed_holdings",
        "stream_curation_bounded", "stream_minhash_index_probe",
        "supply_eigenvector", "supply_kcore",
        # resumed-r15-session touched bodies/kernels
        "ann_recall_at_k", "hard_negative_mining",
        "corpus_curation_pipeline", "token_budget_packing",
        # the r14-touched-but-ungated kernels the r14 verdict item 1
        # requires on the optimized code (representative subset)
        "minhash_lsh_candidates", "jaccard_near_dups",
        "simhash_near_dups", "embedding_near_dups", "ann_sq8_topk",
        "tfidf_top_terms", "contamination_overlap",
        "semantic_dedup_capped", "holdings_turnover",
        "corpus_curation_pipeline_v2", "semdedup_pool_probe",
        # kernels r15 touched again after their r14 gate pass
        "cosine_topk", "ann_pq_topk", "ann_ivfpq_refined",
        "hard_negative_mining_ivf", "bpe_train_merges",
        "quality_classifier_irls", "bpe_segment_tokens",
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
