"""Breakpoint bucketing vs numpy percentile/searchsorted (filters.py:281-287)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_data_science_spark.operators import fractile_split, winsorize


def test_fractile_vs_numpy(spark, daily, daily_pdf):
    sec = daily.filter(F.col("date") == 20230131).withColumn("cap", F.abs("prc") * F.col("shrout"))
    keyed = sec.withColumn("is_key", F.col("permno") % 2 == 0)
    got = (
        fractile_split(keyed, "cap", key_filter=F.col("is_key"), exact=True)
        .toPandas()
        .sort_values("permno")
    )
    caps = got.sort_values("permno")["cap"].to_numpy()
    keys = got.loc[got.is_key, "cap"].to_numpy()
    bp = np.percentile(keys, np.arange(10, 100, 10), method="linear")
    want = (caps[:, None] > bp[None, :]).sum(axis=1) + 1
    assert (got["fractile"].to_numpy() == want).all()


def test_descending(spark, daily):
    sec = daily.filter(F.col("date") == 20230131)
    up = fractile_split(sec, "vol", pcts=[50], out="f", ascending=True).toPandas()
    dn = fractile_split(sec, "vol", pcts=[50], out="f", ascending=False).toPandas()
    merged = up.merge(dn, on="permno", suffixes=("_a", "_d"))
    assert ((merged.f_a + merged.f_d) == 3).all()


def test_winsorize_bounds_match_numpy(spark, daily):
    w1 = winsorize(daily.select("permno", "date", "ret"), "ret", exact=True)
    p1 = w1.toPandas().sort_values(["permno", "date"]).reset_index(drop=True)
    raw = daily.select("ret").toPandas()["ret"].dropna()
    lo, hi = np.percentile(raw, [2.5, 97.5], method="linear")
    assert p1["ret"].min() >= lo - 1e-12 and p1["ret"].max() <= hi + 1e-12
    n_clip = int(((raw < lo) | (raw > hi)).sum())
    got_clip = int(((p1["ret"] == lo) | (p1["ret"] == hi)).sum())
    assert abs(got_clip - n_clip) <= 2  # interpolated edges may land on data


def test_remove_outliers_vs_pandas(spark):
    import numpy as np
    import pandas as pd

    from financial_data_science_spark.operators.fractiles import (
        outlier_fences,
        remove_outliers,
    )

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 200),
        "x": np.concatenate([rng.normal(0, 1, 200), rng.normal(5, 2, 200)]),
    })
    pdf.loc[[3, 7, 250], "x"] = [40.0, -35.0, 99.0]  # plant outliers
    df = spark.createDataFrame(pdf)

    for method in ["tukey", "farout", "iq10"]:
        got_f = (
            outlier_fences(df, "x", method=method, keys="g")
            .toPandas().set_index("g").sort_index()
        )
        for g, sub in pdf.groupby("g"):
            q1, q2, q3 = np.percentile(sub["x"], [25, 50, 75])
            iqr = q3 - q1
            if method == "tukey":
                lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
            elif method == "farout":
                lo, hi = q1 - 3 * iqr, q3 + 3 * iqr
            else:
                lo, hi = q2 - 10 * iqr, q2 + 10 * iqr
            assert got_f.loc[g, "x_lo"] == pytest.approx(lo), (method, g)
            assert got_f.loc[g, "x_hi"] == pytest.approx(hi), (method, g)

    got = remove_outliers(df, "x", method="tukey", keys="g").toPandas()
    kept = got["x"].notna().sum()
    # pandas oracle
    want_kept = 0
    for g, sub in pdf.groupby("g"):
        q1, q3 = np.percentile(sub["x"], [25, 75])
        iqr = q3 - q1
        want_kept += sub["x"].between(q1 - 1.5 * iqr, q3 + 1.5 * iqr).sum()
    assert kept == want_kept
    assert len(got) == len(pdf)  # rows survive, values nulled
