"""Measured probe: incremental MinHash index (functions/minhash_index.py)
— does per-batch probe cost stay flat as the STANDING CORPUS grows?

The ingestion claim is that a batch pays O(batch) hashing plus a bucket
probe, independent of how much corpus is already indexed (the batch
LSH alternative re-hashes the whole corpus per sweep).  This probe
builds at-rest bucketed indexes over 1x / 4x / 16x corpora (same doc
distribution), then times the SAME fixed-size increment against each:

- "probe wall" should grow far sublinearly in corpus size (the probe
  join reads only colliding buckets; the corpus side is bucketed at
  rest so it never re-shuffles);
- "batch-LSH wall" (full minhash_candidates over corpus+increment)
  re-pays the corpus and grows ~linearly — the gap is the reason the
  index exists.

Run: PYTHONPATH=/root/repo python tools/scale_probe_incremental.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from financial_data_science_spark.functions import minhash_index as MHI
from financial_data_science_spark.functions.similarity import minhash_candidates

shutil.rmtree("/tmp/mhidx_probe_wh", ignore_errors=True)  # stale managed-table dirs

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.sql.warehouse.dir", "/tmp/mhidx_probe_wh")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

PARAMS = dict(num_hashes=64, bands=32, shingle_k=3, seed=42)
INC_N = 2_000


def corpus(n, seed=3, id0=0):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(20000)]
    rows = [
        (id0 + i, " ".join(rng.choice(vocab, 50))) for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


inc = corpus(INC_N, seed=9, id0=10_000_000).localCheckpoint(eager=True)

for n in (10_000, 40_000, 160_000):
    docs = corpus(n).repartition(32).localCheckpoint(eager=True)

    t0 = time.time()
    idx = MHI.minhash_build_index(docs, portable=False, **PARAMS)
    MHI.minhash_write_index(idx, f"probe_idx_{n}", n_buckets=32)
    build_wall = time.time() - t0

    reopened = MHI.minhash_read_index(spark, f"probe_idx_{n}", portable=False, **PARAMS)
    # one untimed warmup (JIT + table metadata), then timed probes
    MHI.minhash_query_index(inc, reopened).count()
    probes = []
    for _ in range(3):
        t0 = time.time()
        cnt = MHI.minhash_query_index(inc, reopened).count()
        probes.append(round(time.time() - t0, 2))

    t0 = time.time()
    full = minhash_candidates(docs.unionByName(inc), portable=False, **PARAMS).count()
    batch_wall = time.time() - t0

    print(
        f"corpus={n:7d} build+write={build_wall:6.1f}s "
        f"probe(min-of-3)={min(probes):5.2f}s {probes} pairs={cnt} "
        f"batch-LSH={batch_wall:6.1f}s (pairs={full})",
        flush=True,
    )
