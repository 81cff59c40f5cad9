"""Breakpoint bucketing vs numpy percentile/searchsorted (filters.py:281-287)."""

from __future__ import annotations

import numpy as np
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
