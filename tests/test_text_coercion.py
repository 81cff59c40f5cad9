"""Text functions determinism + schema coercion rules (S1/S2)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_science_spark.functions import text as TXT
from financial_data_science_spark.sources.coercion import as_dtypes, upsert_append


def test_tokens_and_shingles(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["a b  c d", " x y ", "q"]}))
    out = df.select(
        TXT.n_tokens("t").alias("n"), TXT.word_shingles("t", 2).alias("sh")
    ).collect()
    assert [r["n"] for r in out] == [4, 2, 1]
    assert out[0]["sh"] == ["a b", "b c", "c d"]
    assert out[1]["sh"] == ["x y"]
    assert out[2]["sh"] == []


def test_lang_id_on_clear_text(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "the cat and the dog is in a house for it",
                    "der hund und die katze ist nicht ein tier",
                    "le chat et la maison est un lieu pour les",
                    "xyz qqq zzz",
                ]
            }
        )
    )
    got = [r[0] for r in df.select(TXT.lang_id("t")).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_fingerprint_deterministic_and_normalized(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["Hello   World", "hello world", "hello world!"]})
    )
    fps = [r[0] for r in df.select(TXT.fingerprint("t")).collect()]
    assert fps[0] == fps[1]  # case/whitespace-normalized
    assert fps[1] != fps[2]


def test_as_dtypes_rules(spark):
    schema = T.StructType(
        [
            T.StructField("permno", T.IntegerType()),
            T.StructField("date", T.IntegerType()),
            T.StructField("ret", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("name", T.StringType()),
        ]
    )
    raw = spark.createDataFrame(
        pd.DataFrame(
            {
                "PERMNO ": ["10001", "", "10003"],
                "Date": ["2023-01-31", "20230131", ""],
                "ret": ["0.05", "bad", "0.1"],
                "flag": ["", "true", ""],
                "name": ["Café A", "plain", "B"],
            }
        )
    )
    out = as_dtypes(raw, schema).toPandas().sort_values("permno").reset_index(drop=True)
    assert out["permno"].tolist() == [0, 10001, 10003]
    assert out["date"].tolist() == [20230131, 20230131, 0]  # '-' stripped, blank->0
    assert out.loc[out.permno == 0, "ret"].isna().all()  # 'bad' -> null
    assert out["flag"].tolist() == [True, False, False]
    assert "Caf" in out.loc[out.permno == 10001, "name"].iloc[0]
    assert "é" not in out.loc[out.permno == 10001, "name"].iloc[0]


def test_as_dtypes_pk_dedup_and_filters(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.IntegerType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    raw = spark.createDataFrame(
        pd.DataFrame({"k": ["1", "1", "2", "3"], "v": ["5", "9", "7", "8"]})
    )
    out = as_dtypes(raw, schema, primary_keys=["k"], drop={"k": [3]}).toPandas()
    assert sorted(out["k"]) == [1, 2]
    assert out.set_index("k")["v"][1] == 9  # keep last after sort


def test_upsert_append_insert_ignore(spark):
    old = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    new = spark.createDataFrame(pd.DataFrame({"k": [2, 3], "v": [99, 30]}))
    out = upsert_append(old, new, ["k"]).toPandas().sort_values("k")
    assert out["k"].tolist() == [1, 2, 3]
    assert out.set_index("k")["v"][2] == 20  # existing wins (INSERT IGNORE)


def test_tfidf_top_terms_vs_pandas(spark):
    import math
    import pytest

    import pandas as pd

    from financial_data_science_spark.functions.text import tf_idf_terms

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "apple banana apple cherry",
            "banana banana date",
            "apple elderberry elderberry elderberry",
        ],
    })
    got = (
        tf_idf_terms(spark.createDataFrame(pdf), top_k=2)
        .toPandas().set_index(["doc_id", "rank"]).sort_index()
    )
    # pandas oracle with the same smoothed idf
    from collections import Counter

    tfs = {r.doc_id: Counter(r.text.lower().split()) for r in pdf.itertuples()}
    df_counts = Counter(t for c in tfs.values() for t in c)
    n = len(pdf)
    want = {}
    for d, c in tfs.items():
        scored = sorted(
            ((tf * (math.log((n + 1) / (df_counts[t] + 1)) + 1), t)
             for t, tf in c.items()),
            key=lambda x: (-x[0], x[1]),
        )
        want[d] = scored[:2]
    for d, terms in want.items():
        for rank, (score, term) in enumerate(terms, 1):
            assert got.loc[(d, rank), "term"] == term, (d, rank)
            assert got.loc[(d, rank), "tfidf"] == pytest.approx(score)


def test_pii_pattern_counts_vs_re(spark):
    import re

    import pandas as pd

    from financial_data_science_spark.functions.text import (
        PII_PATTERNS,
        pii_pattern_counts,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [
            "mail a@b.co and c.d+x@e-f.org see https://x.y/z?q=1 id 1234567890",
            "no patterns here just words 12345678",
        ],
    })
    got = pii_pattern_counts(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    for name, pat in PII_PATTERNS.items():
        py = pat.replace("\\\\", "\\")
        for r in pdf.itertuples():
            assert got.loc[r.doc_id, name] == len(re.findall(pat, r.text)), (name, r.doc_id)
    assert got.loc[1, "emails"] == 2 and got.loc[1, "urls"] == 1
    assert got.loc[1, "long_digits"] == 1 and got.loc[2, "long_digits"] == 0


def test_repetition_features_hand_case(spark):
    import pandas as pd
    import pytest

    from financial_data_science_spark.functions.text import (
        repetition_features,
    )

    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "a b a b a b",        # 6 words, 2 distinct; bigrams: ab x3, ba x2
            "unique words only here",
            "x",                   # degenerate: no bigrams/trigrams
        ],
    })
    got = repetition_features(spark.createDataFrame(pdf)).toPandas().set_index("doc_id")
    assert got.loc[1, "dup_word_frac"] == pytest.approx(1 - 2 / 6)
    # trigrams of doc1: aba, bab, aba, bab -> 2 distinct of 4
    assert got.loc[1, "dup_3gram_frac"] == pytest.approx(1 - 2 / 4)
    assert got.loc[1, "top_2gram_share"] == pytest.approx(3 / 5)
    assert got.loc[2, "dup_word_frac"] == 0.0
    assert got.loc[2, "dup_3gram_frac"] == 0.0
    assert got.loc[2, "top_2gram_share"] == pytest.approx(1 / 3)
    assert (got.loc[3] == 0.0).all()


def test_redact_pii_masks_all_patterns_in_order(spark):
    import pandas as pd

    from financial_data_science_spark.functions.text import redact_pii

    rows = [
        (1, "mail me at a.b+c@x.co.uk now"),
        (2, "see https://x.io/p?q=1234567890 for details"),
        (3, "card 12345678901 and 98765432109"),
        (4, "clean text stays clean"),
        (5, "a@b.io https://c.d/e 123456789"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "t"]))
    out = {
        r["id"]: r["r"]
        for r in df.select("id", redact_pii(F.col("t")).alias("r")).collect()
    }
    assert out[1] == "mail me at <EMAIL> now"
    # URL masking runs before long-digits: the numeric query string is
    # part of the URL, never shredded into <NUMBER>
    assert out[2] == "see <URL> for details"
    assert out[3] == "card <NUMBER> and <NUMBER>"
    assert out[4] == "clean text stays clean"
    assert out[5] == "<EMAIL> <URL> <NUMBER>"
