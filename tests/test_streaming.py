"""Batch-vs-stream parity (SURVEY §2.9): the same aggregate expressions run
under batch and Structured Streaming must agree row-for-row."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from financial_data_science_spark.operators import bin_aggregate
from financial_data_science_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    stream_bin_aggregate,
    stream_session_counts,
)

SF = "/root/testdata/sf0.001"


def _aggs():
    return {
        "n": F.count(F.lit(1)),
        "sum_value": F.round(F.sum("value"), 6),
        "max_value": F.max("value"),
    }


def test_tumbling_window_parity(spark):
    from financial_data_science_spark.sources.testdata import load_table

    batch = load_table(spark, SF, "events")
    want = (
        bin_aggregate(batch, "ts", "5 minutes", keys=["event_type"], aggs=_aggs())
        .toPandas()
        .sort_values(["bin", "event_type"])
        .reset_index(drop=True)
    )
    stream = read_events_stream(spark, SF)
    res = stream_bin_aggregate(
        stream, "ts", "5 minutes", keys=["event_type"], aggs=_aggs()
    )
    got = (
        run_stream_to_memory(spark, res, "parity_bins", output_mode="complete")
        .toPandas()
        .sort_values(["bin", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_stream_dedup_within_watermark(spark):
    from financial_data_science_spark.streaming.windows import stream_dedup

    stream = read_events_stream(spark, SF)
    out = run_stream_to_memory(
        spark, stream_dedup(stream, ["user_id", "event_type"], "ts"), "parity_dedup"
    )
    batch_n = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert out.count() == batch_n


def test_session_window_counts(spark):
    from financial_data_science_spark.sources.testdata import load_table
    from financial_data_science_spark.operators import sessionize

    stream = read_events_stream(spark, SF)
    res = stream_session_counts(stream, "ts", "30 minutes", keys="user_id",
                                watermark=None)
    got = run_stream_to_memory(
        spark, res, "parity_sessions", output_mode="complete"
    ).toPandas()
    batch = load_table(spark, SF, "events")
    want = (
        sessionize(batch, "ts", 1800, keys="user_id")
        .groupBy("user_id", "session_id")
        .count()
        .toPandas()
    )
    # same number of sessions per user under both definitions
    g = got.groupby("user_id").size().sort_index()
    w = want.groupby("user_id").size().sort_index()
    pd.testing.assert_series_equal(g, w, check_names=False)


def test_stream_minhash_novelty_parity(spark):
    """Three-way parity for streaming MinHash near-dup detection:
    (1) the per-row stateless band keys (minhash_band_keys), (2) the
    batch aggregate pipeline (minhash_signatures + the banded fold),
    and (3) the streaming first-seen-bucket dedup must all yield the
    SAME distinct (band, bhash) set — proving the streaming form is the
    incremental twin of the batch bucket join, independent of
    micro-batch arrival order."""
    from financial_data_science_spark.functions.similarity import (
        minhash_band_keys,
        minhash_signatures,
    )
    from financial_data_science_spark.sources.testdata import load_table
    from financial_data_science_spark.streaming.windows import (
        read_documents_stream,
        stream_novel_buckets,
    )

    MOD = (1 << 31) - 1
    docs = load_table(spark, SF, "documents")

    perrow = (
        minhash_band_keys(docs, num_hashes=8, bands=4)
        .select("band", "bhash").distinct().toPandas()
    )
    sig = minhash_signatures(docs, num_hashes=8, portable=True)
    folds = []
    for b in range(4):
        acc = (
            (F.col(f"h{2*b}") * F.lit(65537) + F.col(f"h{2*b+1}")) % F.lit(MOD)
        )
        folds.append(sig.select(F.lit(b).alias("band"), acc.alias("bhash")))
    batch = folds[0]
    for f in folds[1:]:
        batch = batch.unionByName(f)
    batch = batch.distinct().toPandas()

    stream = read_documents_stream(spark, SF)
    res = stream_novel_buckets(stream, num_hashes=8, bands=4).select(
        "band", "bhash"
    )
    got = run_stream_to_memory(
        spark, res, "parity_stream_minhash", output_mode="append"
    ).toPandas()

    def norm(df):
        return (
            df.astype({"band": "int64", "bhash": "int64"})
            .sort_values(["band", "bhash"]).reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(norm(perrow), norm(batch))
    pd.testing.assert_frame_equal(norm(got), norm(perrow))
    # dedup really deduplicates: emitted rows are unique per bucket key
    assert got.duplicated(["band", "bhash"]).sum() == 0


def test_stream_minhash_novelty_bounded_state(spark):
    """The bounded-state production arm (dropDuplicatesWithinWatermark —
    state evicted at the horizon) must emit the same distinct bucket set
    as the default global-state arm when all event times fit inside one
    watermark horizon (sf0.001 spans doc_id seconds << the 1h watermark),
    and must never emit a duplicate bucket within that horizon."""
    from financial_data_science_spark.functions.similarity import (
        minhash_band_keys,
    )
    from financial_data_science_spark.sources.testdata import load_table
    from financial_data_science_spark.streaming.windows import (
        read_documents_stream,
        stream_novel_buckets,
    )

    docs = load_table(spark, SF, "documents")
    want = (
        minhash_band_keys(docs, num_hashes=8, bands=4)
        .select("band", "bhash").distinct().toPandas()
    )
    stream = read_documents_stream(spark, SF)
    res = stream_novel_buckets(
        stream, num_hashes=8, bands=4, bounded_state=True
    ).select("band", "bhash")
    got = run_stream_to_memory(
        spark, res, "parity_stream_minhash_bounded", output_mode="append"
    ).toPandas()

    def norm(df):
        return (
            df.astype({"band": "int64", "bhash": "int64"})
            .sort_values(["band", "bhash"]).reset_index(drop=True)
        )

    assert got.duplicated(["band", "bhash"]).sum() == 0
    pd.testing.assert_frame_equal(norm(got), norm(want))


def test_stream_contamination_parity(spark):
    """The streaming on-arrival contamination screen must flag exactly
    the docs (with exactly the overlap counts) that the batch
    decontamination pass (pipeline.contamination) reports with
    n_contaminated > 0."""
    from financial_data_science_spark.functions.pipeline import contamination
    from financial_data_science_spark.queries import Q
    from financial_data_science_spark.sources.testdata import load_table

    got = (
        Q["stream_contamination_flags"](spark, SF)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    docs = load_table(spark, SF, "documents")
    want = (
        contamination(
            docs.filter(F.col("doc_id") % 17 != 0),
            docs.filter(F.col("doc_id") % 17 == 0),
            n=5,
        )
        .filter(F.col("n_contaminated") > 0)
        .select("doc_id", "n_contaminated")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_stream_curation_pipeline_parity(spark):
    """The composed streaming curation DAG (contamination screen ->
    trained-quality gate -> novel-bucket dedup, ONE streaming query)
    must emit exactly the bucket set its batch replay produces:
    batch-train the same model, apply the same median cut and
    contamination drop, bucket the kept docs with the SAME band-key
    projections, distinct."""
    from financial_data_science_spark.functions.classifier import (
        logistic_irls,
    )
    from financial_data_science_spark.functions.pipeline import contamination
    from financial_data_science_spark.functions.similarity import (
        minhash_band_keys,
    )
    from financial_data_science_spark.queries import Q, _doc_quality_feats, _r
    from financial_data_science_spark.sources.testdata import load_table

    got = set(
        map(tuple, Q["stream_curation_pipeline"](spark, SF)
            .toPandas()[["band", "bhash"]].itertuples(index=False))
    )

    docs = load_table(spark, SF, "documents")
    feats = _doc_quality_feats(docs, materialize=True)
    traj = logistic_irls(feats, ["x1", "x2"], "y", iters=3)
    b = traj[-1]
    scored = feats.select(
        "doc_id",
        _r(
            F.lit(1.0) / (F.lit(1.0) + F.exp(
                -(F.lit(b["b0"]) + F.lit(b["b1"]) * F.col("x1")
                  + F.lit(b["b2"]) * F.col("x2")))),
            6,
        ).alias("p6"),
    )
    med = scored.agg(F.percentile("p6", F.lit(0.5)).alias("m")).collect()[0]["m"]
    contaminated = (
        contamination(
            docs.filter(F.col("doc_id") % 17 != 0),
            docs.filter(F.col("doc_id") % 17 == 0),
            n=5,
        )
        .filter(F.col("n_contaminated") > 0)
        .select("doc_id")
    )
    kept = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .join(scored.filter(F.col("p6") > F.lit(med)), "doc_id")
        .join(contaminated, "doc_id", "left_anti")
    )
    want = set(
        map(tuple, minhash_band_keys(kept, num_hashes=8, bands=4)
            .select("band", "bhash").distinct()
            .toPandas()[["band", "bhash"]].itertuples(index=False))
    )
    assert got == want and len(got) > 0


def test_stream_curation_plan_has_one_stateful_op(spark):
    """Structural pin for the composed curation DAG (the library
    surface streaming/curation.py): the analyzed streaming plan must
    contain exactly ONE stateful operator (the bucket Deduplicate) and
    exactly one Python stage (the mapInPandas screen) — no Aggregate
    anywhere in the stream leg.  Values don't matter for plan shape,
    so dummy betas/cut/set."""
    import pytest

    from financial_data_science_spark.streaming.curation import (
        curate_document_stream,
    )
    from financial_data_science_spark.streaming.windows import (
        read_documents_stream,
    )

    stream = read_documents_stream(spark, SF).filter(
        F.col("doc_id") % 17 != 0
    )
    buckets = curate_document_stream(
        stream, spark, beta=(0.1, 0.2, -0.3), score_cut=0.5,
        bench_hashes=[1, 2, 3],
    ).select("band", "bhash")
    plan = buckets._jdf.queryExecution().analyzed().toString()
    assert plan.count("Deduplicate") == 1, plan
    assert plan.count("MapInPandas") == 1, plan
    assert "Aggregate" not in plan, plan
    assert buckets.isStreaming
    # the bounded-state arm swaps the dedup operator, still exactly one
    bounded = curate_document_stream(
        stream, spark, beta=(0.1, 0.2, -0.3), score_cut=0.5,
        bench_hashes=[1, 2, 3], bounded_state=True,
    )
    bplan = bounded._jdf.queryExecution().analyzed().toString()
    assert bplan.count("DeduplicateWithinWatermark") == 1, bplan
    # beta-length contract
    with pytest.raises(ValueError, match="coefficients"):
        curate_document_stream(
            stream, spark, beta=(0.1, 0.2), score_cut=0.5,
            bench_hashes=[1],
        )
    # the three novelty arms are mutually exclusive — an ambiguous
    # combination must raise, not silently pick a shape
    with pytest.raises(ValueError, match="not both"):
        curate_document_stream(
            stream, spark, beta=(0.1, 0.2, -0.3), score_cut=0.5,
            bench_hashes=[1], bounded_state=True,
            novelty_window="3 minutes",
        )


def test_stream_ann_top1_matches_batch_ivf(spark):
    """On-arrival ANN parity: the streaming per-arrival argmax over the
    probed lists must pick exactly the neighbor the BATCH query path
    (ivf_query_index, k=1) picks on the same index — same quantizer,
    same probes, same rounded scores, same tie-break."""
    from financial_data_science_spark.functions.similarity import (
        ivf_build_index,
        ivf_query_index,
    )
    from financial_data_science_spark.queries import Q
    from financial_data_science_spark.sources.testdata import load_table

    got = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in Q["stream_ann_top1"](spark, SF).collect()
    }
    emb = load_table(spark, SF, "embeddings")
    index = ivf_build_index(emb, nlist=8, iters=3, train_mod=4)
    want = {
        (r["query_id"], r["neighbor_id"], round(r["score"], 4))
        for r in ivf_query_index(
            emb.filter(F.col("vec_id") < 20), index, k=1, nprobe=2
        ).collect()
    }
    assert got == want and len(got) == 20


def test_stream_ann_production_append_parity(spark):
    """The append+watermark arm (once-per-arrival emission, state
    evicted at the horizon) must emit EXACTLY the complete arm's rows
    for the oracle-checked query set — same index, same probes, same
    rounded scores; only the output mode differs."""
    from financial_data_science_spark.queries import Q

    got = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in Q["stream_ann_top1_production"](spark, SF).collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in Q["stream_ann_top1"](spark, SF).collect()
    }
    assert got == want and len(got) == 20


def test_stream_ann_append_flush_drain_parity(spark):
    """The flush recipe for DRAINED bounded replays: with NO
    continuation arrivals, append mode leaves the final in-horizon
    windows unemitted (the documented emission-horizon contract) — one
    watermark-advancing sentinel arrival (flush_ts) must flush them, so
    append+flush emits EXACTLY the complete arm's row set."""
    from datetime import datetime, timezone

    from financial_data_science_spark.functions.similarity import (
        ivf_build_index,
    )
    from financial_data_science_spark.queries import Q
    from financial_data_science_spark.sources.testdata import load_table
    from financial_data_science_spark.streaming.ann import on_arrival_nearest
    from financial_data_science_spark.streaming.windows import (
        read_embeddings_stream,
        run_stream_to_memory,
    )

    emb = load_table(spark, SF, "embeddings")
    index = ivf_build_index(emb, nlist=8, iters=3, train_mod=4)
    # drained stream: vec_id < 20 ONLY — no continuation rows to push
    # the watermark past the last window (stream_ann_top1_production
    # keeps 20..24 flowing for exactly that; here the sentinel does it)
    stream = read_embeddings_stream(spark, SF).filter(F.col("vec_id") < 20)
    flush_ts = datetime.fromtimestamp(1577836800 + 19 + 3, tz=timezone.utc)
    best = on_arrival_nearest(
        stream, index, nprobe=2, watermark="0 seconds", flush_ts=flush_ts
    )
    out = run_stream_to_memory(
        spark, best, "t_ann_flush_parity", output_mode="append"
    )
    got = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in out.select("query_id", "neighbor_id", "score").collect()
    }
    want = {
        (r["query_id"], r["neighbor_id"], r["score"])
        for r in Q["stream_ann_top1"](spark, SF).collect()
    }
    assert got == want and len(got) == 20
    # without the sentinel the drained stream under-emits — the contract
    # the flush exists for (watermark = max SEEN event time, so the last
    # 1s window's end is never passed)
    bare = on_arrival_nearest(stream, index, nprobe=2, watermark="0 seconds")
    bare_out = run_stream_to_memory(
        spark, bare, "t_ann_noflush", output_mode="append"
    )
    assert bare_out.count() < 20
    # flush_ts without a watermark is a contract error
    with pytest.raises(ValueError, match="watermark"):
        on_arrival_nearest(stream, index, flush_ts=flush_ts)


def test_curate_and_tag_stream_matches_batch_replay(spark):
    """The fused screen->gate->novelty->ANN-tag streaming DAG (two
    chained append-mode stateful aggs) must emit exactly what the
    BATCH Spark replay computes: kept docs -> band keys -> min-doc per
    (3-min window, bucket) -> IVF top-1 over the novel ids — an
    independent path (static DataFrames + ivf_query_index, no
    streaming, no DuckDB)."""
    from financial_data_science_spark.functions.similarity import (
        ivf_build_index,
        ivf_query_index,
        minhash_band_keys,
    )
    from financial_data_science_spark.queries import Q
    from financial_data_science_spark.sources.testdata import load_table

    got = {
        (r["doc_id"], r["neighbor_id"], r["score"])
        for r in Q["stream_curation_tagged"](spark, SF).collect()
    }

    # batch replay of the kept set: reuse the v3 catalog entry's first
    # stages (trained gate + decontamination) via its packing output?
    # No — recompute directly with the same offline legs.
    from financial_data_science_spark.functions.classifier import (
        logistic_irls,
        logistic_score,
    )
    from financial_data_science_spark.functions.pipeline import (
        contaminated_ids,
    )
    import financial_data_science_spark.queries as QQ

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    feats = QQ._doc_quality_feats(docs, materialize=True)
    traj = logistic_irls(feats, ["x1", "x2"], "y", iters=3)
    b = traj[-1]
    scored = logistic_score(
        feats, ["x1", "x2"], (b["b0"], b["b1"], b["b2"])
    ).select("doc_id", F.round("prob", 6).alias("p6"))
    med = scored.agg(F.percentile("p6", F.lit(0.5)).alias("m")).collect()[0]["m"]
    good = scored.filter(F.col("p6") > F.lit(med)).select("doc_id")
    train = docs.filter(F.col("doc_id") % 17 != 0)
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    kept = (
        train.join(good, "doc_id")
        .join(contaminated_ids(train, bench, n=5), "doc_id", "left_anti")
        .select("doc_id", "text")
    )
    novel_ids = (
        minhash_band_keys(kept, num_hashes=8, bands=4)
        .groupBy(
            F.floor(F.col("doc_id") / 180).alias("wid"), "band", "bhash"
        )
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .distinct()
    )
    index = ivf_build_index(emb, nlist=8, iters=3, train_mod=4)
    # F.round (HALF_UP), not python round (HALF_EVEN): the streaming
    # path rounds in Spark, so the replay must round the same way
    want = {
        (r["query_id"], r["neighbor_id"], r["s4"])
        for r in ivf_query_index(
            emb.join(novel_ids, emb.vec_id == novel_ids.doc_id, "left_semi"),
            index, k=1, nprobe=2,
        ).select("query_id", "neighbor_id", F.round("score", 4).alias("s4"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_stream_curation_bounded_matches_batch_replay(spark):
    """The bounded-state novelty arm (window-ARGMIN instead of the
    arrival-order-dependent dropDuplicatesWithinWatermark) must emit
    exactly what the BATCH Spark replay computes: kept docs -> per-doc
    band keys -> min doc per (3-minute tumbling window, band, bhash).
    This is the determinism claim that makes the horizon-bounded form
    oracle-checkable — min(doc_id) is arrival-order-free."""
    from financial_data_science_spark.functions.classifier import (
        logistic_irls,
    )
    from financial_data_science_spark.functions.pipeline import contamination
    from financial_data_science_spark.functions.similarity import (
        minhash_band_keys,
    )
    from financial_data_science_spark.queries import Q, _doc_quality_feats, _r
    from financial_data_science_spark.sources.testdata import load_table

    got = {
        (r["wid"], r["band"], r["bhash"], r["doc_id"])
        for r in Q["stream_curation_bounded"](spark, SF).collect()
    }

    docs = load_table(spark, SF, "documents")
    feats = _doc_quality_feats(docs, materialize=True)
    traj = logistic_irls(feats, ["x1", "x2"], "y", iters=3)
    b = traj[-1]
    scored = feats.select(
        "doc_id",
        _r(
            F.lit(1.0) / (F.lit(1.0) + F.exp(
                -(F.lit(b["b0"]) + F.lit(b["b1"]) * F.col("x1")
                  + F.lit(b["b2"]) * F.col("x2")))),
            6,
        ).alias("p6"),
    )
    med = scored.agg(F.percentile("p6", F.lit(0.5)).alias("m")).collect()[0]["m"]
    contaminated = (
        contamination(
            docs.filter(F.col("doc_id") % 17 != 0),
            docs.filter(F.col("doc_id") % 17 == 0),
            n=5,
        )
        .filter(F.col("n_contaminated") > 0)
        .select("doc_id")
    )
    kept = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .join(scored.filter(F.col("p6") > F.lit(med)), "doc_id")
        .join(contaminated, "doc_id", "left_anti")
    )
    # ts = 1577836800 + doc_id seconds; 1577836800 % 180 == 0, so the
    # epoch-aligned window id is (1577836800 + doc_id) div 180
    want = {
        (r["wid"], r["band"], r["bhash"], r["doc_id"])
        for r in minhash_band_keys(kept, num_hashes=8, bands=4)
        .select(
            F.floor((F.lit(1577836800) + F.col("doc_id")) / 180)
            .cast("long").alias("wid"),
            "band", "bhash", "doc_id",
        )
        .groupBy("wid", "band", "bhash")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert got == want and len(got) > 0
