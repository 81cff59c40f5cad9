"""Multimodal plumbing: binary payload metadata + mapInPandas decode stub."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from financial_data_science_spark.functions.multimodal import (
    attach_payload_metadata,
    extract_image_features,
    make_media_table,
)


def _media(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["alpha beta", "gamma", "alpha beta"]})
    )
    return make_media_table(docs)


def test_payload_metadata(spark):
    m = _media(spark).toPandas()
    assert (m["n_bytes"] > 0).all()
    assert set(m["format"]) == {"unknown"}  # text payloads have no magic


def test_magic_number_sniff(spark):
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2],
            "payload": [b"\xff\xd8\xff\xe0rest", b"\x89PNG\r\n\x1a\nrest"],
        }
    )
    out = attach_payload_metadata(spark.createDataFrame(pdf)).toPandas()
    assert out.sort_values("media_id")["format"].tolist() == ["jpeg", "png"]


def test_decode_stub_deterministic(spark):
    m = _media(spark)
    f1 = extract_image_features(m).toPandas().sort_values("media_id")
    f2 = (
        extract_image_features(m.repartition(4))
        .toPandas()
        .sort_values("media_id")
    )
    # identical features regardless of partitioning (pure function of bytes)
    pd.testing.assert_frame_equal(
        f1.reset_index(drop=True), f2.reset_index(drop=True)
    )
    # identical payloads -> identical features
    assert f1[f1.media_id == 1]["phash"].iloc[0] == f1[f1.media_id == 3]["phash"].iloc[0]
    assert f1["width"].between(64, 64 + 255).all()
