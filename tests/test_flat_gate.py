"""similarity._flat_gate: the size-gated flat-chain scoring must be a
pure PLAN choice — flat (corpus-scale) and fold (bench-scale) forms of
the gated kernels produce bit-identical rounded scores.
"""

from __future__ import annotations

import pytest

from financial_data_science_spark.functions import similarity as SIM
from financial_data_science_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def emb(spark):
    return load_table(spark, SF, "embeddings")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_gate_threshold_dispatch(spark, emb, monkeypatch):
    monkeypatch.setattr(SIM, "_FLAT_MIN_BYTES", 1 << 50)
    assert SIM._flat_gate(emb, 64) == 0  # below threshold -> fold
    monkeypatch.setattr(SIM, "_FLAT_MIN_BYTES", 0)
    assert SIM._flat_gate(emb, 64) == 64  # at/above -> flat
    assert SIM._flat_gate(emb, 0) == 0  # dim unknown stays fold


def test_sq8_topk_flat_equals_fold(spark, emb, monkeypatch):
    q = emb.filter("vec_id < 3")
    monkeypatch.setattr(SIM, "_FLAT_MIN_BYTES", 1 << 50)
    fold = _rows(SIM.sq8_topk(q, emb, k=3), ["query_id", "neighbor_id", "score"])
    monkeypatch.setattr(SIM, "_FLAT_MIN_BYTES", 0)
    flat = _rows(SIM.sq8_topk(q, emb, k=3), ["query_id", "neighbor_id", "score"])
    assert fold == flat and len(fold) > 0


def test_ivf_query_flat_equals_fold(spark, emb, monkeypatch):
    q = emb.filter("vec_id < 3")
    monkeypatch.setattr(SIM, "_FLAT_MIN_BYTES", 1 << 50)
    ix = SIM.ivf_build_index(emb, nlist=4, iters=2)
    fold = _rows(
        SIM.ivf_query_index(q, ix, k=3, nprobe=2),
        ["query_id", "neighbor_id", "score"],
    )
    monkeypatch.setattr(SIM, "_FLAT_MIN_BYTES", 0)
    flat = _rows(
        SIM.ivf_query_index(q, ix, k=3, nprobe=2),
        ["query_id", "neighbor_id", "score"],
    )
    assert fold == flat and len(fold) > 0
