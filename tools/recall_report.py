"""Recall@k report for the ANN ladder vs exact top-k (SCALE.md table).

For each rung — IVF (nprobe sweep), PQ (m sweep), IVF+PQ, residual
IVF+PQ, IVFPQ+refine, SQ8 — computes mean recall@k against brute-force
exact cosine top-k over the sf embeddings, using the library's own
recall_at_k.  This is the retrieval-quality dial the quantization
parameters trade against scan cost; correctness oracles prove the
implementations replay, THIS number says how good the retrieval is.

Usage: PYTHONPATH=/root/repo python tools/recall_report.py
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), RECALL_NQ=100.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_science_spark import get_spark
from financial_data_science_spark.functions import similarity as SIM
from financial_data_science_spark.sources.testdata import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NQ = int(os.environ.get("RECALL_NQ", "100"))
K = 10


def main() -> None:
    spark = get_spark("recall-report")
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint(eager=True)
    n = emb.count()
    q = emb.filter(F.col("vec_id") < NQ).localCheckpoint(eager=True)
    exact = SIM.cosine_topk(q, emb, k=K).localCheckpoint(eager=True)
    print(f"# corpus={n} queries={q.count()} k={K} sf_dir={SF_DIR}", flush=True)

    rows = []

    def report(name: str, df) -> None:
        t0 = time.time()
        r = (
            SIM.recall_at_k(df, exact, k=K)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        rows.append((name, round(r, 4), round(time.time() - t0, 1)))
        print(f"{name:34s} recall@{K}={r:.4f}", flush=True)

    ivf_index = SIM.ivf_build_index(emb, nlist=16, iters=3, train_mod=4,
                                    persist=True)
    for nprobe in (1, 2, 4, 8):
        report(f"ivf nlist=16 nprobe={nprobe}",
               SIM.ivf_query_index(q, ivf_index, k=K, nprobe=nprobe))

    for m in (2, 4, 8):
        report(f"pq m={m} k*=16",
               SIM.pq_topk(q, emb, dim=64, m=m, k=16, topk=K, iters=2,
                           train_mod=4))

    ivfpq_index = SIM.ivfpq_build_index(emb, dim=64, nlist=16, m=4, k=16,
                                        iters=2, train_mod=4, persist=True)
    for nprobe in (2, 4, 8):
        report(f"ivfpq nlist=16 m=4 nprobe={nprobe}",
               SIM.ivfpq_query_index(q, ivfpq_index, nprobe=nprobe, topk=K))

    report("ivfpq_residual nlist=16 m=4 np=4",
           SIM.ivfpq_residual_topk(q, emb, dim=64, nlist=16, nprobe=4, m=4,
                                   k=16, topk=K, iters=2, train_mod=4))

    cand = SIM.ivfpq_query_index(q, ivfpq_index, nprobe=4, topk=3 * K)
    report("ivfpq+refine (3k candidates)",
           SIM.rerank_exact(cand, emb, k=K, metric="cosine"))

    report("sq8", SIM.sq8_topk(q, emb, k=K))

    print("\n| variant | recall@10 |")
    print("| --- | --- |")
    for name, r, _ in rows:
        print(f"| {name} | {r:.4f} |")


if __name__ == "__main__":
    main()
