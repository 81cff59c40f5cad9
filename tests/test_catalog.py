"""Catalog invariants: every query has an oracle (rows-only is extinct)
and the driver-gate prefix stays pinned to the proven-green round-3 set."""

from __future__ import annotations

import json
import os

R3 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                  "CORRECTNESS_r03.json")


def test_every_query_has_an_oracle():
    from financial_data_science_spark.queries import ORACLE, Q

    missing = set(Q) - set(ORACLE)
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"
    stray = set(ORACLE) - set(Q)
    assert not stray, f"oracles without a query: {sorted(stray)}"


def test_gate_prefix_is_pinned():
    from financial_data_science_spark.queries import Q

    with open(R3) as f:
        gate = list(json.load(f))
    assert list(Q)[: len(gate)] == gate


def test_entry_contract_shape():
    import __spark_entry__ as E

    q = E.queries()
    o = E.oracle_sql()
    assert callable(E.entry)
    assert set(o) <= set(q)
    assert len(q) >= 85
