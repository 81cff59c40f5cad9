"""as-of join vs pandas.merge_asof oracle (SURVEY §5 unit strategy)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.operators import asof_join


def _mk(spark, seed=0, n_left=400, n_right=300, n_keys=12):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": rng.integers(0, 10_000, n_left),
            "lv": rng.normal(size=n_left),
        }
    ).drop_duplicates(["k", "t"])
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "t": rng.integers(0, 10_000, n_right),
            "rv": rng.normal(size=n_right),
        }
    ).drop_duplicates(["k", "t"])
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def _oracle(left, right, direction="backward", exact=True, tolerance=None):
    return pd.merge_asof(
        left.sort_values("t"),
        right.sort_values("t"),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tolerance,
    ).sort_values(["k", "t"]).reset_index(drop=True)


def _got(df):
    return (
        df.toPandas().sort_values(["k", "t"]).reset_index(drop=True)
    )


def _check(got, want):
    assert len(got) == len(want)
    np.testing.assert_allclose(
        got["rv"].to_numpy(float), want["rv"].to_numpy(float), equal_nan=True
    )


def test_union_matches_pandas(spark):
    for seed in (0, 1, 2):
        l, r, lp, rp = _mk(spark, seed)
        _check(_got(asof_join(l, r, by="k", left_on="t")), _oracle(lp, rp))


def test_join_strategy_matches_pandas(spark):
    l, r, lp, rp = _mk(spark, 3)
    _check(
        _got(asof_join(l, r, by="k", left_on="t", strategy="join")),
        _oracle(lp, rp),
    )


def test_forward(spark):
    l, r, lp, rp = _mk(spark, 4)
    _check(
        _got(asof_join(l, r, by="k", left_on="t", direction="forward")),
        _oracle(lp, rp, direction="forward"),
    )


def test_no_exact_matches(spark):
    l, r, lp, rp = _mk(spark, 5)
    _check(
        _got(asof_join(l, r, by="k", left_on="t", allow_exact_matches=False)),
        _oracle(lp, rp, exact=False),
    )


def test_tolerance(spark):
    l, r, lp, rp = _mk(spark, 6)
    _check(
        _got(asof_join(l, r, by="k", left_on="t", tolerance=500)),
        _oracle(lp, rp, tolerance=500),
    )


def test_left_rows_preserved(spark):
    l, r, _, _ = _mk(spark, 7)
    out = asof_join(l, r, by="k", left_on="t")
    assert out.count() == l.count()


def test_different_on_names_and_collision_suffix(spark):
    l, r, lp, rp = _mk(spark, 8)
    r2 = r.withColumnRenamed("t", "rt").withColumnRenamed("rv", "lv")
    out = asof_join(l, r2, by="k", left_on="t", right_on="rt", suffix="_r")
    assert "lv_r" in out.columns and "lv" in out.columns
    want = _oracle(lp, rp)
    got = _got(out.withColumnRenamed("lv_r", "rv"))
    _check(got, want)
