"""Cross-engine equality of the portable hash twins: every Spark Column
builder must evaluate bit-for-bit equal to its DuckDB SQL-text twin.
(The oracle gate exercises these indirectly; this is the fast local net.)"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.functions.porthash import (
    charhash,
    keyhash,
    plane_sign,
    sql_charhash,
    sql_keyhash,
    sql_plane_sign,
    sql_tokhash62,
    tokhash62,
)


def test_keyhash_twins(spark):
    keys = list(range(0, 50)) + [10**6, 10**12, 7_654_321]
    pdf = pd.DataFrame({"k": keys})
    for salt in (0, 1, 17):
        got = (
            spark.createDataFrame(pdf)
            .select("k", keyhash(F.col("k"), salt).alias("h"))
            .toPandas().sort_values("k")["h"].tolist()
        )
        want = duckdb.sql(
            f"SELECT k, {sql_keyhash('k', salt)} AS h FROM pdf ORDER BY k"
        ).df()["h"].tolist()
        assert got == want, salt


def test_token_hash_twins(spark):
    toks = ["a", "the", "alpha beta", "Zz9!", "longer token with spaces"]
    pdf = pd.DataFrame({"t": toks})
    got = (
        spark.createDataFrame(pdf)
        .select(
            "t",
            charhash(F.col("t")).alias("c"),
            tokhash62(F.col("t")).alias("w"),
        )
        .toPandas().sort_values("t")
    )
    want = duckdb.sql(
        f"SELECT t, {sql_charhash('t')} AS c, {sql_tokhash62('t')} AS w "
        "FROM pdf ORDER BY t"
    ).df()
    assert got["c"].tolist() == want["c"].tolist()
    assert got["w"].tolist() == want["w"].tolist()


def test_plane_sign_twins(spark):
    pdf = pd.DataFrame({"i": list(range(0, 40))})
    for p in (0, 3, 11):
        got = (
            spark.createDataFrame(pdf)
            .select("i", plane_sign(p, F.col("i")).alias("s"))
            .toPandas().sort_values("i")["s"].tolist()
        )
        want = duckdb.sql(
            f"SELECT i, {sql_plane_sign(str(p), 'i')} AS s FROM pdf ORDER BY i"
        ).df()["s"].tolist()
        assert got == want, p
        # signs are roughly balanced per plane (SimHash vote health)
        assert 0.2 < (pd.Series(got) > 0).mean() < 0.8
