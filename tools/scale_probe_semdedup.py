"""Measured probe: SemDeDup blocking recall vs cost across nlist.

k-means blocking trades recall for never materializing the corpus
product: a pair above tau is FOUND only if both vectors land in the
same cluster.  This probe measures, on the real embeddings tables,
what fraction of ALL >=tau pairs (exact all-pairs ground truth —
affordable at probe scale only) the within-cluster join captures as
nlist grows, alongside the pair-generation cost it avoids
(sum of within-cluster products vs n^2/2).

Scale limit, measured: at the 20k-vector sf1 blowup the exact ground
truth is a 400M-pair inequality join (BroadcastNestedLoopJoin) that ran
>30 min without completing on local[32] — the all-pairs oracle is
affordable at the 2k probe scale ONLY, which is rather the point the
blocking exists to make.

Run: PYTHONPATH=/root/repo python tools/scale_probe_semdedup.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from financial_data_science_spark.functions.similarity import (
    cosine,
    ivf_build_index,
)
from financial_data_science_spark.sources.testdata import load_table

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAU = 0.4

emb = load_table(spark, SF, "embeddings").localCheckpoint(eager=True)
n = emb.count()

# exact ground truth: all >= tau pairs (n^2/2 — probe scale only)
l = emb.select(F.col("vec_id").alias("li"), F.col("embedding").alias("lv"))
r = emb.select(F.col("vec_id").alias("ri"), F.col("embedding").alias("rv"))
truth = (
    l.join(r, F.col("li") < F.col("ri"))
    .withColumn("c6", F.round(cosine(F.col("lv"), F.col("rv")), 6))
    .filter(F.col("c6") >= TAU)
    .select("li", "ri")
    .localCheckpoint(eager=True)
)
n_truth = truth.count()
print(f"n={n} tau={TAU} exact pairs={n_truth} (all-pairs ground truth)", flush=True)

for nlist in (4, 8, 16, 32):
    t0 = time.time()
    index = ivf_build_index(emb, nlist=nlist, iters=3, train_mod=4, persist=True)
    b = index["binned"]
    bl = b.select(F.col("vec_id").alias("li"), F.col("embedding").alias("lv"), "cluster")
    br = b.select(F.col("vec_id").alias("ri"), F.col("embedding").alias("rv"), "cluster")
    blocked = (
        bl.join(br, "cluster")
        .filter(F.col("li") < F.col("ri"))
        .withColumn("c6", F.round(cosine(F.col("lv"), F.col("rv")), 6))
        .filter(F.col("c6") >= TAU)
        .select("li", "ri")
    )
    found = blocked.join(truth, ["li", "ri"], "left_semi").count()
    wall = time.time() - t0
    sizes = b.groupBy("cluster").count().agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs")
    ).collect()[0]["pairs"]
    print(
        f"nlist={nlist:3d} recall={found}/{n_truth}={found/max(n_truth,1):.3f} "
        f"within-cluster pairs={int(sizes):10d} (vs all-pairs {n*(n-1)//2}) "
        f"wall={wall:.1f}s",
        flush=True,
    )


# ---- planted-duplicate arm: the pairs SemDeDup actually targets ----
# random-vector pairs at tau=0.4 are weakly-correlated noise and spread
# across cluster boundaries (the table above is honest about that);
# semantic DUPLICATES are near-identical vectors, which co-cluster.
import numpy as np
import pandas as pd

rows = emb.select("vec_id", "embedding").toPandas()
rng = np.random.default_rng(17)
picks = rng.choice(len(rows), 200, replace=False)
dup_rows = []
for j, i in enumerate(picks):
    v = np.array(rows.iloc[i]["embedding"])
    noisy = v + rng.normal(scale=0.01 * np.linalg.norm(v) / np.sqrt(len(v)), size=len(v))
    dup_rows.append((1_000_000 + j, [float(x) for x in noisy], int(rows.iloc[i]["vec_id"])))
dups = spark.createDataFrame(
    pd.DataFrame(dup_rows, columns=["vec_id", "embedding", "twin_of"])
)
aug = emb.select("vec_id", "embedding").unionByName(
    dups.select("vec_id", "embedding")
).localCheckpoint(eager=True)
planted = {(int(t), 1_000_000 + j) for j, t in enumerate(dups.select("twin_of").toPandas()["twin_of"])}

for nlist in (4, 8, 16, 32):
    index = ivf_build_index(aug, nlist=nlist, iters=3, train_mod=4, persist=True)
    b = index["binned"]
    bl = b.select(F.col("vec_id").alias("li"), "cluster")
    br = b.select(F.col("vec_id").alias("ri"), "cluster")
    same = bl.join(br, "cluster").filter(F.col("li") < F.col("ri")).select("li", "ri")
    got = {
        (int(a), int(c)) for a, c in same.filter(F.col("ri") >= 1_000_000)
        .toPandas().to_numpy()
    }
    hit = len(planted & got)
    print(
        f"PLANTED nlist={nlist:3d} co-cluster recall={hit}/200={hit/200:.3f}",
        flush=True,
    )
