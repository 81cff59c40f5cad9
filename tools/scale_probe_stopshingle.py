"""Measured probe: LSH bucket skew from boilerplate shingles, and the
max_df stop-shingle fix.  Plants a shared header on every synthetic doc,
then times band_candidates with and without the df filter at growing
corpus sizes.  Run: PYTHONPATH=/root/repo python tools/scale_probe_stopshingle.py"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, pandas as pd
from pyspark.sql import SparkSession, functions as F
from financial_data_science_spark.functions.similarity import band_candidates

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "16g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

HEADER = "copyright notice all rights reserved unauthorized reproduction prohibited by law"

def corpus(n):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(20000)]
    rows = [(i, HEADER + " " + " ".join(rng.choice(vocab, 50))) for i in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))

for n in (5000, 25000):
    docs = corpus(n).localCheckpoint(eager=True)
    for label, kw in (("no filter", {}), ("max_df=0.5", {"max_df": 0.5})):
        t0 = time.time()
        cnt = band_candidates(docs, num_hashes=64, bands=32, **kw).count()
        print(f"docs={n:6d} {label:12s} candidates={cnt:9d} wall={time.time()-t0:.2f}s",
              flush=True)
