"""The composed streaming curation DAG as a library surface.

A 100 TB/day ingestion pipeline runs its curation stages FUSED — one
scan, one streaming query — not as three nightly passes.  This module
assembles the r7/r8 pieces (on-arrival contamination screen, trained
logistic quality gate, MinHash novel-bucket dedup) into that single
DAG, with the expensive decisions made OFFLINE and entering the stream
as broadcast scalars/sets:

  offline (batch, bounded):   IRLS-train the quality model
                              (functions/classifier.py), pick the score
                              cut, collect the benchmark n-gram hash set
  online (the stream, fused): stateless gram hashes -> mapInPandas
                              membership screen -> map-side logistic
                              score gate -> per-row band keys -> ONE
                              stateful dropDuplicates on the bucket key

Measured (tools/scale_probe_docstream.py, SCALE.md): the fused DAG at
50k docs costs 18.5s where the standalone novelty arm alone costs 45.3s
in the same run — the screen+gate prune docs before the bands x docs
fan-out, so composition is strictly cheaper than its pieces.

Oracle-gated by the catalog query `stream_curation_pipeline` (the
bucket-set output is arrival-order-free, so a batch SQL replay checks
it hash-strict).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_document_stream(
    stream: DataFrame,
    spark: SparkSession,
    beta: tuple,
    score_cut: float,
    bench_hashes,
    feature_exprs: list[Column] | None = None,
    text_col: str = "text",
    ts_col: str = "ts",
    ngram_n: int = 5,
    portable_grams: bool = True,
    num_hashes: int = 8,
    bands: int = 4,
    watermark: str = "1 hour",
    bounded_state: bool = False,
) -> DataFrame:
    """Screen -> gate -> novelty in ONE streaming DAG; returns the
    novel (band, bhash) bucket rows of clean, above-cut documents.

    ``beta``/``score_cut``/``bench_hashes`` are the offline leg's
    outputs (train with :func:`classifier.logistic_irls`; cut at the
    exact or approx score median; collect the benchmark gram hashes —
    eval suites are tiny by construction).  ``feature_exprs`` are the
    k feature columns the model was trained on, as expressions over the
    stream's columns; defaults to the document-quality pair
    [ln(1+ntok), n_chars/(1+ntok)] matching `_doc_quality_feats`.

    Stateful footprint: exactly ONE operator — the bucket dedup.
    ``bounded_state=False`` keeps the GLOBAL distinct-bucket set
    (order-free, batch-parity, right for backfills);
    ``bounded_state=True`` switches to dropDuplicatesWithinWatermark
    (state bounded by the horizon, quiet buckets re-emit — the
    indefinite-ingestion trade, same as stream_novel_buckets)."""
    from financial_data_science_spark.functions.pipeline import (
        contamination_screen,
    )
    from financial_data_science_spark.functions.similarity import (
        minhash_band_keys,
    )
    from financial_data_science_spark.functions.text import n_tokens

    if feature_exprs is None:
        ntok = n_tokens(text_col).cast("double")
        feature_exprs = [
            F.log(F.lit(1.0) + ntok),
            F.col("n_chars").cast("double") / (F.lit(1.0) + ntok),
        ]
    if len(beta) != len(feature_exprs) + 1:
        raise ValueError(
            f"beta has {len(beta)} coefficients; expected intercept + "
            f"{len(feature_exprs)} features = {len(feature_exprs) + 1}"
        )
    eta = F.lit(beta[0])
    for b, x in zip(beta[1:], feature_exprs):
        eta = eta + F.lit(b) * x
    # 6dp round-before-compare: a cross-engine ulp at the cut boundary
    # cannot flip gate membership against an oracle
    p6 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)), 6)

    curated = contamination_screen(
        stream, spark, bench_hashes, text_col=text_col, n=ngram_n,
        portable=portable_grams,
    ).filter(p6 > F.lit(float(score_cut)))
    keys = minhash_band_keys(
        curated, text_col=text_col, num_hashes=num_hashes, bands=bands
    )
    wm = keys.withWatermark(ts_col, watermark)
    if bounded_state:
        return wm.dropDuplicatesWithinWatermark(["band", "bhash"])
    return wm.dropDuplicates(["band", "bhash"])
