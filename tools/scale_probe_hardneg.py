"""Hard-negative mining at scale: exact O(Q*N) miner vs the filtered-ANN
production twin on the persisted IVFPQ index (SCALE.md evidence).

The exact miner scores every query against EVERY different-label corpus
vector; the production twin probes the standing IVFPQ index with the
label-inequality applied BEFORE the top-k window (filtered search over
the label payload column), then exact-reranks only the bounded
candidate pool.  This probe measures, at the blown-up SF:

  1. exact miner wall (the per-epoch cost a 100 TB corpus cannot pay);
  2. index build wall (paid once per corpus version, amortized);
  3. filtered query+rerank wall per (nprobe, pool) dial;
  4. recall@K of the mined negative set vs the exact miner's.

Usage: PYTHONPATH=/root/repo python tools/scale_probe_hardneg.py
Env: SPARK_GRAFT_SF_DIR (default /tmp/sf1), HN_NQ=100, HN_K=10.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from financial_data_science_spark import get_spark
from financial_data_science_spark.functions import similarity as SIM
from financial_data_science_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
NQ = int(os.environ.get("HN_NQ", "100"))
K = int(os.environ.get("HN_K", "10"))


def exact_miner(queries, emb):
    """Broadcast-queries exact miner: top-K most-similar different-label
    vectors per query (the gate entry's shape, parameterized)."""
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("qlabel"),
            F.col("embedding").alias("__qv__"),
        )
    )
    scored = emb.join(q, F.col("label") != F.col("qlabel")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(SIM.cosine(F.col("__qv__"), F.col("embedding")), 6).alias("s"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K)
        .drop("rn")
    )


def main() -> None:
    spark = get_spark("hardneg-probe")
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < NQ).localCheckpoint(eager=True)
    nq = queries.count()
    print(f"# corpus={n} queries={nq} k={K} sf_dir={SF_DIR}", flush=True)

    t0 = time.time()
    exact = exact_miner(queries, emb).localCheckpoint(eager=True)
    exact_wall = time.time() - t0
    print(f"exact miner: {exact_wall:.2f}s ({exact.count()} pairs)", flush=True)

    t0 = time.time()
    index = SIM.ivfpq_build_index(
        emb, dim=64, nlist=8, m=2, k=8, iters=2, train_mod=4,
        persist=True, payload=("label",),
    )
    index["coded"].count()
    build_wall = time.time() - t0
    print(f"index build (once per corpus version): {build_wall:.2f}s", flush=True)

    t0 = time.time()
    ivf_index = SIM.ivf_build_index(
        emb, nlist=8, iters=3, train_mod=4, persist=True, payload=("label",)
    )
    ivf_index["binned"].count()
    ivf_build_wall = time.time() - t0
    print(f"IVF (full-precision) index build: {ivf_build_wall:.2f}s", flush=True)

    ivf_rows = []
    for nprobe in (1, 2, 4):
        t0 = time.time()
        mined = SIM.ivf_query_index(
            queries.select("vec_id", "embedding",
                           F.col("label").alias("qlabel")),
            ivf_index, k=K, nprobe=nprobe,
            qkeep=("qlabel",),
            candidate_filter=F.col("label") != F.col("qlabel"),
        ).localCheckpoint(eager=True)
        wall = time.time() - t0
        rec = (
            SIM.recall_at_k(mined, exact, k=K)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        ivf_rows.append((nprobe, round(wall, 2), round(rec, 4)))
        print(
            f"filtered-IVF nprobe={nprobe}: {wall:.2f}s recall@{K}={rec:.4f}",
            flush=True,
        )

    rows = []
    for nprobe in (1, 2, 4):
        for pool in (50, 100):
            t0 = time.time()
            cand = SIM.ivfpq_query_index(
                queries.select("vec_id", "embedding",
                               F.col("label").alias("qlabel")),
                index, nprobe=nprobe, topk=pool,
                qkeep=("qlabel",),
                candidate_filter=F.col("label") != F.col("qlabel"),
            )
            mined = SIM.rerank_exact(
                cand.select("query_id", "neighbor_id"), emb, k=K,
                metric="cosine",
            ).localCheckpoint(eager=True)
            wall = time.time() - t0
            rec = (
                SIM.recall_at_k(mined, exact, k=K)
                .agg(F.avg("recall").alias("r"))
                .collect()[0]["r"]
            )
            rows.append((nprobe, pool, round(wall, 2), round(rec, 4)))
            print(
                f"filtered-ANN nprobe={nprobe} pool={pool}: "
                f"{wall:.2f}s recall@{K}={rec:.4f}",
                flush=True,
            )

    print(f"\n| dial | wall (s) | recall@{K} | vs exact |")
    print("| --- | --- | --- | --- |")
    print(f"| exact miner (O(Q*N)) | {exact_wall:.2f} | 1.0000 | 1.0x |")
    for nprobe, wall, rec in ivf_rows:
        print(
            f"| filtered-IVF nprobe={nprobe} | {wall:.2f} "
            f"| {rec:.4f} | {exact_wall / wall:.1f}x |"
        )
    for nprobe, pool, wall, rec in rows:
        print(
            f"| filtered-IVFPQ nprobe={nprobe} pool={pool} | {wall:.2f} "
            f"| {rec:.4f} | {exact_wall / wall:.1f}x |"
        )
    print(f"| IVF index build (amortized) | {ivf_build_wall:.2f} | - | - |")
    print(f"| IVFPQ index build (amortized) | {build_wall:.2f} | - | - |")


if __name__ == "__main__":
    main()
