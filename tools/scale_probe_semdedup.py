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
(the full pass: recall sweep, planted dups, planted skew, structured
mega-cell, bin-once index, probe-recall, drift, rebuild-cycle).  To run
only the function-wrapped arms set SPARK_GRAFT_SEMDEDUP_ARMS to a comma
list of probe_recall,drift,sdidx,rebuild_cycle — the straight-line arms
are skipped then.
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


# ---- probe-recall arm (r13): the PROBE-SIDE truncation trade of
# semdedup_query_index, quantified (the r12 verdict's What's-wrong #3).
# The batch side has the rank-chain argument; the probe side only has a
# label — so plant a SPREAD isotropic mega-cell (defeats the splitter;
# the blob stays one over-cap cell), probe with near-twin batches, and
# measure missed-pair / missed-DECISION rates vs cap for both
# representative policies:
#   lowest     — cap lowest-id ranks (r12 behavior): id-biased; a twin
#                of a member past rank cap is missed with certainty
#   stratified — every ceil(cnt/cap)-th rank (r13): unbiased across id
#                epochs, same cap bound, same at-rest index
# Twin placement arms: UNIFORM over the blob (any deterministic
# cap-subset has the same cap/n expectation) and HIGH-RANK (last 10% of
# blob ids — the realistic "recent ingestion duplicates" case, where
# lowest-id reps are structurally blind).
def probe_recall_arm():
    import numpy as np
    import pandas as pd

    from financial_data_science_spark.functions.semdedup import (
        semdedup_build_index,
        semdedup_query_index,
    )

    base = emb.select("vec_id", "embedding").toPandas()
    center = np.array(base.iloc[0]["embedding"], dtype=float)
    scale = np.linalg.norm(center) / np.sqrt(len(center))
    nblob = int(0.3 * len(base) / 0.7)
    rng = np.random.default_rng(43)
    blob_vecs = [center + rng.normal(0, 0.30 * scale, len(center))
                 for _ in range(nblob)]
    blob = [(2_000_000 + j, [float(x) for x in v])
            for j, v in enumerate(blob_vecs)]
    corpus = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(pd.DataFrame(blob, columns=["vec_id", "embedding"]))
    ).localCheckpoint(eager=True)
    ncorp = corpus.count()

    def twins(kind, nprobe=100):
        if kind == "uniform":
            picks = rng.choice(nblob, min(nprobe, nblob), replace=False)
        else:  # high-rank: last 10% of blob ids
            pop = np.arange(int(0.9 * nblob), nblob)
            picks = rng.choice(pop, min(nprobe, len(pop)), replace=False)
        rows = []
        for i, j in enumerate(sorted(int(p) for p in picks)):
            v = blob_vecs[j] + rng.normal(0, 1e-4 * scale, len(center))
            rows.append((9_000_000 + i, [float(x) for x in v]))
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        ).localCheckpoint(eager=True)

    PTAU = 0.95
    from financial_data_science_spark.functions.similarity import cosine as _cos

    def exact_truth(probes):
        return (
            probes.select(F.col("vec_id").alias("qid"),
                          F.col("embedding").alias("qv"))
            .crossJoin(corpus.select(F.col("vec_id").alias("cid"),
                                     F.col("embedding").alias("cv")))
            .withColumn("c6", F.round(_cos(F.col("qv"), F.col("cv")), 6))
            .filter(F.col("c6") >= PTAU)
            .select("qid", "cid")
            .localCheckpoint(eager=True)
        )

    batches = {k: twins(k) for k in ("uniform", "highrank")}
    truths = {k: exact_truth(v) for k, v in batches.items()}
    for k, t in truths.items():
        print(f"PROBE-RECALL truth[{k}]: pairs={t.count()} "
              f"probes-with-witness={t.select('qid').distinct().count()}"
              f"/{batches[k].count()}",
              flush=True)

    for cap in (64, 128, 256):
        idx = semdedup_build_index(
            corpus, nlist=8, iters=3, train_mod=4, cap=cap, nsub=8,
            sub_iters=2, max_depth=2, persist=True,
        )
        maxcell = idx["cells"].agg(F.max("__cnt__")).collect()[0][0]
        for kind in ("uniform", "highrank"):
            truth = truths[kind]
            n_t = truth.count()
            n_td = truth.select("qid").distinct().count()
            for policy in ("lowest", "stratified"):
                got = (
                    semdedup_query_index(
                        batches[kind], idx, tau=PTAU, reps=policy,
                    )
                    .select(F.col("new_vec_id").alias("qid"),
                            F.col("corpus_id").alias("cid"))
                    .localCheckpoint(eager=True)
                )
                hit = got.join(truth, ["qid", "cid"], "left_semi").count()
                hitd = (got.join(truth, ["qid", "cid"], "left_semi")
                        .select("qid").distinct().count())
                print(
                    f"PROBE-RECALL cap={cap:3d} max_cell={maxcell} "
                    f"twins={kind:8s} reps={policy:10s} "
                    f"pair_recall={hit}/{n_t}={hit/max(n_t,1):.3f} "
                    f"decision_recall={hitd}/{n_td}={hitd/max(n_td,1):.3f}",
                    flush=True,
                )

    # -- family sub-arm: id-LOCALIZED witness sets, the case the rep
    # policy actually decides.  The isotropic blob above has ~8
    # geometric witnesses per probe scattered uniformly over cell
    # ranks, so ANY cap-subset makes most decisions (both policies
    # ~0.9 there) — but real duplicate families arrive CONTIGUOUSLY in
    # id order (crawl bursts of one template), so a probe's entire
    # witness set is one id-run inside the cell.  Plant nfam tight
    # families (intra-family cos ~1, inter-family ~0.92 < tau) whose
    # centers are isotropic in one region (Lloyd reduces but cannot
    # bound the cells), ids contiguous per family.  Guarantee under
    # test: a stratified step of ceil(cnt/cap) <= family size hits
    # EVERY family (any id-run of length >= step contains a rep),
    # while lowest-id reps are structurally blind past rank cap.
    # Measured (this arm, sf0.1): decision recall 0.14-0.20 under
    # 'lowest' vs 1.000 under 'stratified' on both twin placements
    # (not exactly 0 for 'lowest': families straddle several cells,
    # and a high-ID family can still be low-RANK inside a cell whose
    # other members have even higher ids).
    FAM_M = 20            # >= the stratified step ceil(859/64)=14, so the
    PTAU2 = 0.98          # id-run coverage guarantee is engaged; tau above
    nfam = nblob // FAM_M  # the ~0.92 inter-family cosine isolates families
    fam_centers = [center + rng.normal(0, 0.30 * scale, len(center))
                   for _ in range(nfam)]
    fam_vecs = [
        fam_centers[f] + rng.normal(0, 1e-4 * scale, len(center))
        for f in range(nfam) for _ in range(FAM_M)
    ]
    fam_blob = [(2_000_000 + j, [float(x) for x in v])
                for j, v in enumerate(fam_vecs)]
    corpus2 = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            pd.DataFrame(fam_blob, columns=["vec_id", "embedding"])
        )
    ).localCheckpoint(eager=True)

    def fam_twins(kind, nprobe=100):
        if kind == "famuniform":
            pop = np.arange(len(fam_vecs))
        else:  # famhigh: members of the last 10% of families
            pop = np.arange(int(0.9 * nfam) * FAM_M, nfam * FAM_M)
        picks = rng.choice(pop, min(nprobe, len(pop)), replace=False)
        rows = [
            (9_000_000 + i,
             [float(x) for x in
              fam_vecs[j] + rng.normal(0, 1e-4 * scale, len(center))])
            for i, j in enumerate(sorted(int(p) for p in picks))
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        ).localCheckpoint(eager=True)

    def exact_truth2(probes):
        return (
            probes.select(F.col("vec_id").alias("qid"),
                          F.col("embedding").alias("qv"))
            .crossJoin(corpus2.select(F.col("vec_id").alias("cid"),
                                      F.col("embedding").alias("cv")))
            .withColumn("c6", F.round(_cos(F.col("qv"), F.col("cv")), 6))
            .filter(F.col("c6") >= PTAU2).select("qid", "cid")
            .localCheckpoint(eager=True)
        )

    CAP2 = 64
    idx2 = semdedup_build_index(
        corpus2, nlist=8, iters=3, train_mod=4, cap=CAP2, nsub=8,
        sub_iters=2, max_depth=1, persist=True,
    )
    maxcell2 = idx2["cells"].agg(F.max("__cnt__")).collect()[0][0]
    for kind in ("famuniform", "famhigh"):
        probes = fam_twins(kind)
        truth = exact_truth2(probes)
        n_t, n_td = truth.count(), truth.select("qid").distinct().count()
        for policy in ("lowest", "stratified"):
            got = (
                semdedup_query_index(probes, idx2, tau=PTAU2, reps=policy)
                .select(F.col("new_vec_id").alias("qid"),
                        F.col("corpus_id").alias("cid"))
                .localCheckpoint(eager=True)
            )
            hit = got.join(truth, ["qid", "cid"], "left_semi").count()
            hitd = (got.join(truth, ["qid", "cid"], "left_semi")
                    .select("qid").distinct().count())
            print(
                f"PROBE-RECALL FAMILY cap={CAP2} max_cell={maxcell2} "
                f"fam={nfam}x{FAM_M} twins={kind:10s} reps={policy:10s} "
                f"pair_recall={hit}/{n_t}={hit/max(n_t,1):.3f} "
                f"decision_recall={hitd}/{n_td}={hitd/max(n_td,1):.3f}",
                flush=True,
            )


# ---- drift arm (r13): the rebuild-cadence number.  The semantic index
# is probe-between-periodic-rebuilds BY DESIGN (no append: cell ranks
# are corpus-order statistics).  What a deployment needs is the decay
# curve: as ingested batches accumulate OUTSIDE the frozen index, what
# fraction of a new batch's true near-dup decisions does the frozen
# probe still make?  Batches drift (content moves away from the
# standing corpus) and duplicate recent content preferentially — the
# realistic worst case for a frozen index.  Also measured: the
# ACCUMULATED-POOL HIT SHARE (new batch brute-forced against the small
# un-indexed pool) — a signal production can compute exactly without
# ground truth, which is the rebuild trigger MIGRATION.md documents.
def drift_arm():
    import numpy as np
    import pandas as pd

    from financial_data_science_spark.functions.semdedup import (
        semdedup_build_index,
        semdedup_query_index,
    )
    from financial_data_science_spark.functions.similarity import cosine as _cos

    base = emb.select("vec_id", "embedding").toPandas()
    dim = len(base.iloc[0]["embedding"])
    center = np.array(base.iloc[0]["embedding"], dtype=float)
    scale = np.linalg.norm(center) / np.sqrt(dim)
    rng = np.random.default_rng(47)
    drift_dir = rng.normal(0, 1, dim)
    drift_dir /= np.linalg.norm(drift_dir)

    PTAU = 0.95
    NB, NFRESH, NDUP_RECENT, NDUP_BASE = 20, 60, 30, 10
    all_batches = []  # list of (vec_id, vec ndarray)
    batch_frames = {}
    next_id = 3_000_000
    for j in range(1, NB + 1):
        rows = []
        # fresh drifted content: random vectors pushed drift*j along a
        # fixed direction — new topics the standing corpus never saw
        for _ in range(NFRESH):
            v = (rng.normal(0, scale, dim)
                 + center * 0.2
                 + drift_dir * (0.15 * j) * scale * np.sqrt(dim))
            rows.append((next_id, v)); next_id += 1
        # near-dups of RECENT content (previous batch) — the dup mass a
        # frozen index cannot see
        if all_batches:
            prev = all_batches[-NFRESH - NDUP_RECENT - NDUP_BASE:]
            for _ in range(NDUP_RECENT):
                _, tv = prev[int(rng.integers(len(prev)))]
                rows.append((next_id, tv + rng.normal(0, 1e-4 * scale, dim)))
                next_id += 1
        # near-dups of the STANDING corpus — what the frozen index CAN see
        for _ in range(NDUP_BASE):
            tv = np.array(
                base.iloc[int(rng.integers(len(base)))]["embedding"],
                dtype=float,
            )
            rows.append((next_id, tv + rng.normal(0, 1e-4 * scale, dim)))
            next_id += 1
        all_batches.extend(rows)
        batch_frames[j] = spark.createDataFrame(
            pd.DataFrame(
                [(i, [float(x) for x in v]) for i, v in rows],
                columns=["vec_id", "embedding"],
            )
        ).localCheckpoint(eager=True)

    c0 = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    frozen = semdedup_build_index(
        c0, nlist=8, iters=3, train_mod=4, cap=256, nsub=8, sub_iters=2,
        max_depth=2, persist=True,
    )

    def decisions(pairs_df, qcol):
        return pairs_df.select(F.col(qcol).alias("qid")).distinct()

    for k in (1, 5, 10, 20):
        probe = batch_frames[k]
        # standing-at-k corpus = c0 + batches 1..k-1
        standing = c0
        pool = None
        for j in range(1, k):
            standing = standing.unionByName(batch_frames[j])
            pool = (batch_frames[j] if pool is None
                    else pool.unionByName(batch_frames[j]))
        standing = standing.localCheckpoint(eager=True)

        # exact truth vs the full standing corpus
        truth = (
            probe.select(F.col("vec_id").alias("qid"),
                         F.col("embedding").alias("qv"))
            .crossJoin(standing.select(F.col("vec_id").alias("cid"),
                                       F.col("embedding").alias("cv")))
            .withColumn("c6", F.round(_cos(F.col("qv"), F.col("cv")), 6))
            .filter(F.col("c6") >= PTAU).select("qid", "cid")
            .localCheckpoint(eager=True)
        )
        n_td = truth.select("qid").distinct().count()

        frozen_hits = decisions(
            semdedup_query_index(probe, frozen, tau=PTAU), "new_vec_id"
        ).join(decisions(truth, "qid"), "qid", "left_semi").count()

        fresh_idx = semdedup_build_index(
            standing, nlist=8, iters=3, train_mod=4, cap=256, nsub=8,
            sub_iters=2, max_depth=2, persist=True,
        )
        fresh_hits = decisions(
            semdedup_query_index(probe, fresh_idx, tau=PTAU), "new_vec_id"
        ).join(decisions(truth, "qid"), "qid", "left_semi").count()

        # the production-computable trigger: share of probe vectors whose
        # ONLY witnesses live in the un-indexed accumulation pool
        if pool is not None:
            pool_hits = (
                probe.select(F.col("vec_id").alias("qid"),
                             F.col("embedding").alias("qv"))
                .crossJoin(pool.select(F.col("embedding").alias("cv")))
                .withColumn("c6", F.round(_cos(F.col("qv"), F.col("cv")), 6))
                .filter(F.col("c6") >= PTAU).select("qid").distinct()
            )
            pool_share = pool_hits.count() / probe.count()
        else:
            pool_share = 0.0
        print(
            f"DRIFT k={k:2d} standing={standing.count():6d} "
            f"truth_decisions={n_td} frozen={frozen_hits} "
            f"({frozen_hits/max(n_td,1):.3f}) fresh={fresh_hits} "
            f"({fresh_hits/max(n_td,1):.3f}) "
            f"pool_hit_share={pool_share:.3f}",
            flush=True,
        )


# ---- bin-once index probe arm (r12): per-batch probe wall vs corpus
# size.  Same measurement shape as the IVF probe rows in SCALE.md: the
# corpus is blown up 50x with deterministic per-copy jitter, the index
# is built once per corpus (untimed half), and the timed half is a
# fixed 200-vector batch routed through the frozen chain + the
# representative-capped cell join (both rep policies at r13).  Claim:
# probe wall is flat-to-sublinear in corpus size (assignment is
# map-side; candidates are bounded per cell).
def sdidx_arm():
    import numpy as np
    import pandas as pd

    from financial_data_science_spark.functions.semdedup import (
        semdedup_build_index,
        semdedup_query_index,
    )

    base = emb.select("vec_id", "embedding").toPandas()
    nb = len(base)
    batch_rows = [
        (9_000_000 + j, [float(x) for x in np.array(base.iloc[j % nb]["embedding"]) * 1.0005])
        for j in range(200)
    ]
    batch_df = spark.createDataFrame(
        pd.DataFrame(batch_rows, columns=["vec_id", "embedding"])
    ).localCheckpoint(eager=True)

    for k in (1, 50):
        if k == 1:
            corpus_k = emb.select("vec_id", "embedding")
        else:
            copies = []
            for c in range(k):
                copies.append(
                    emb.select(
                        (F.col("vec_id") + F.lit(c * 100_000)).alias("vec_id"),
                        F.transform(
                            "embedding",
                            lambda x: x * (1.0 + F.lit(c) * 1e-4),
                        ).alias("embedding"),
                    )
                )
            corpus_k = copies[0]
            for cdf in copies[1:]:
                corpus_k = corpus_k.unionByName(cdf)
        corpus_k = corpus_k.localCheckpoint(eager=True)
        n = corpus_k.count()
        t0 = time.time()
        idxp = semdedup_build_index(
            corpus_k, nlist=8, iters=3, train_mod=4, cap=256, nsub=8,
            sub_iters=2, max_depth=2, persist=True,
        )
        t_build = time.time() - t0
        out = semdedup_query_index(batch_df, idxp, tau=0.9)
        out.count()  # warm the plan (v3 discipline)
        t0 = time.time()
        hits = out.count()
        t_probe = time.time() - t0
        # r13: the stratified-reps policy at the same corpus scale — same
        # bound, different rank filter; must stay flat like 'lowest'
        out_s = semdedup_query_index(batch_df, idxp, tau=0.9, reps="stratified")
        out_s.count()
        t0 = time.time()
        hits_s = out_s.count()
        t_probe_s = time.time() - t0
        print(
            f"SDIDX corpus={n:7d} ({k}x) | build {t_build:.1f}s (once) | "
            f"warm probe of 200-vector batch {t_probe:.2f}s, {hits} pairs | "
            f"stratified {t_probe_s:.2f}s, {hits_s} pairs",
            flush=True,
        )


# ---- rebuild-cycle arm (r14): the CLOSED LOOP the r13 drift arm and
# MIGRATION.md recipe describe but never executed end-to-end — drift
# until the production-computable trigger (pool-hit share from
# semdedup_query_with_pool) crosses tolerance, FIRE the rebuild, drain
# the pool, and measure recall restored, over multiple full cycles in
# one run.  Reference lifecycle analog: the reference's incremental
# daily update (real_time.py:210-250) is exactly this
# probe-accumulate-refresh shape.
#
# Generator difference vs drift_arm: each batch's recent-dup mass
# targets a uniform pick over the LAST THREE batches (not just the
# previous one), so after a rebuild the pool share RAMPS 0 -> ~0.10 ->
# ~0.20 -> ~0.30 as the recent window leaves the index — the trigger
# crossing is a measured point on a curve, not a step.  Per batch the
# loop records:
#   trigger      — share of batch vectors with a pool witness, computed
#                  from the ONE semdedup_query_with_pool frame
#                  (production-computable, no ground truth)
#   idx_recall   — frozen-index-only decision recall vs exact truth
#                  (decays while the pool grows)
#   loop_recall  — decision recall of the FULL lifecycle frame
#                  (index + pool arms together; the loop's promise is
#                  that this stays ~1.000 BETWEEN rebuilds too)
#   rebuild      — whether trigger > TOL fired this batch (rebuild
#                  folds standing+batch into a fresh index, pool drains)
def rebuild_cycle_arm():
    import numpy as np
    import pandas as pd

    from financial_data_science_spark.functions.semdedup import (
        semdedup_build_index,
        semdedup_query_index,
        semdedup_query_with_pool,
    )
    from financial_data_science_spark.functions.similarity import cosine as _cos

    # probe policy (SPARK_GRAFT_REBUILD_REPS): 'lowest' | 'stratified'.
    # At the 10x corpus the accumulated ingestion mass outgrows the cell
    # cap and 'lowest' goes structurally blind to the NEWEST indexed
    # batches right after a rebuild (ids are ingestion-ordered, so
    # recent batches sit past rank cap) — the loop-scale form of the
    # r13 probe-recall FAMILY failure; 'stratified' is the fix.
    reps = os.environ.get("SPARK_GRAFT_REBUILD_REPS", "lowest")
    # cell cap (SPARK_GRAFT_REBUILD_CAP): the capped-probe recall bound
    # binds when the ingestion region outgrows cap in cells the splitter
    # cannot separate (isotropic drift mass) — single-witness dups are
    # then caught at ~kept-reps/cell-size under either policy.  The cap
    # is the dial: size it to the expected between-rebuild ingestion
    # mass per cell region.
    cap = int(os.environ.get("SPARK_GRAFT_REBUILD_CAP", "256"))

    base = emb.select("vec_id", "embedding").toPandas()
    dim = len(base.iloc[0]["embedding"])
    center = np.array(base.iloc[0]["embedding"], dtype=float)
    scale = np.linalg.norm(center) / np.sqrt(dim)
    rng = np.random.default_rng(53)
    drift_dir = rng.normal(0, 1, dim)
    drift_dir /= np.linalg.norm(drift_dir)

    PTAU, TOL = 0.95, 0.15
    # horizon (SPARK_GRAFT_REBUILD_NB): 12 = the certified r14 run; longer
    # horizons measure steady-STATE cadence (is the rebuild interval
    # stationary across many cycles, does loop recall hold at every k)
    NB = int(os.environ.get("SPARK_GRAFT_REBUILD_NB", "12"))
    NFRESH, NDUP_RECENT, NDUP_BASE, WINDOW = 60, 30, 10, 3
    all_rows = []  # (vec_id, vec) across accepted batches, id order = arrival
    batch_vecs = {}  # j -> list[(vec_id, vec)]
    next_id = 3_000_000
    for j in range(1, NB + 1):
        rows = []
        for _ in range(NFRESH):
            v = (rng.normal(0, scale, dim)
                 + center * 0.2
                 + drift_dir * (0.15 * j) * scale * np.sqrt(dim))
            rows.append((next_id, v)); next_id += 1
        # dups of the last WINDOW batches (uniform over their members):
        # right after a rebuild these targets are IN the index, so the
        # pool share ramps as the window slides past the rebuild point
        recent_pop = [r for jj in range(max(1, j - WINDOW), j)
                      for r in batch_vecs[jj]]
        if recent_pop:
            for _ in range(NDUP_RECENT):
                _, tv = recent_pop[int(rng.integers(len(recent_pop)))]
                rows.append((next_id, tv + rng.normal(0, 1e-4 * scale, dim)))
                next_id += 1
        for _ in range(NDUP_BASE):
            tv = np.array(
                base.iloc[int(rng.integers(len(base)))]["embedding"],
                dtype=float,
            )
            rows.append((next_id, tv + rng.normal(0, 1e-4 * scale, dim)))
            next_id += 1
        batch_vecs[j] = rows
        all_rows.extend(rows)

    def frame(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                [(i, [float(x) for x in v]) for i, v in rows],
                columns=["vec_id", "embedding"],
            )
        ).localCheckpoint(eager=True)

    batch_frames = {j: frame(batch_vecs[j]) for j in batch_vecs}

    def build(df):
        return semdedup_build_index(
            df, nlist=8, iters=3, train_mod=4, cap=cap, nsub=8, sub_iters=2,
            max_depth=2, persist=True,
        )

    c0 = emb.select("vec_id", "embedding").localCheckpoint(eager=True)
    standing = c0                 # everything accepted so far
    index = build(c0)             # the frozen index (rebuilt on trigger)
    pool_frames = []              # accepted batches since the last rebuild
    n_rebuilds = 0
    t_loop = time.time()
    for k in range(1, NB + 1):
        probe = batch_frames[k]
        nprobe = probe.count()
        pool = pool_frames[0] if pool_frames else probe.limit(0)
        for pf in pool_frames[1:]:
            pool = pool.unionByName(pf)
        lifecycle = semdedup_query_with_pool(
            probe, index, pool, tau=PTAU, reps=reps
        ).localCheckpoint(eager=True)
        # the production trigger: batch vectors with a pool witness
        trigger = (
            lifecycle.filter(F.col("source") == "pool")
            .select("new_vec_id").distinct().count() / nprobe
        )
        # measurement only (ground truth): decisions vs the standing corpus
        truth_d = (
            probe.select(F.col("vec_id").alias("qid"),
                         F.col("embedding").alias("qv"))
            .crossJoin(standing.select(F.col("embedding").alias("cv")))
            .withColumn("c6", F.round(_cos(F.col("qv"), F.col("cv")), 6))
            .filter(F.col("c6") >= PTAU).select("qid").distinct()
            .localCheckpoint(eager=True)
        )
        n_td = truth_d.count()
        idx_hits = (
            semdedup_query_index(probe, index, tau=PTAU, reps=reps)
            .select(F.col("new_vec_id").alias("qid")).distinct()
            .join(truth_d, "qid", "left_semi").count()
        )
        loop_hits = (
            lifecycle.select(F.col("new_vec_id").alias("qid")).distinct()
            .join(truth_d, "qid", "left_semi").count()
        )
        fired = trigger > TOL
        # accept the batch, then rebuild if the trigger crossed: the
        # fresh index folds standing + this batch; the pool drains
        standing = standing.unionByName(probe).localCheckpoint(eager=True)
        if fired:
            index = build(standing)
            pool_frames = []
            n_rebuilds += 1
        else:
            pool_frames.append(probe)
        pool_n = sum(pf.count() for pf in pool_frames)
        print(
            f"REBUILD-CYCLE k={k:2d} trigger={trigger:.3f} "
            f"idx_recall={idx_hits}/{n_td}={idx_hits/max(n_td,1):.3f} "
            f"loop_recall={loop_hits}/{n_td}={loop_hits/max(n_td,1):.3f} "
            f"{'REBUILD' if fired else 'accept '} pool={pool_n:4d} "
            f"standing={standing.count()}",
            flush=True,
        )
    print(
        f"REBUILD-CYCLE done: {NB} batches, {n_rebuilds} rebuilds, "
        f"tol={TOL}, reps={reps}, cap={cap}, wall={time.time()-t_loop:.1f}s",
        flush=True,
    )


_ARMS = set(filter(None, os.environ.get(
    "SPARK_GRAFT_SEMDEDUP_ARMS", "").split(",")))
if _ARMS:
    if "probe_recall" in _ARMS:
        probe_recall_arm()
    if "drift" in _ARMS:
        drift_arm()
    if "sdidx" in _ARMS:
        sdidx_arm()
    if "rebuild_cycle" in _ARMS:
        rebuild_cycle_arm()
    sys.exit(0)

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


# ---- planted-SKEW arm (r12): the mega-cell worst case the guards exist
# for.  30% of the corpus is collapsed into ONE dense region two ways:
#   spread blob  — one region, distinct templates (Lloyd CAN split it);
#   point mass   — near-identical vectors (no quantizer separates them;
#                  only the sorted-neighborhood budget bounds the pairs).
# Measured: within-cell pairs EVALUATED (the quadratic cost driver) and
# wall for plain semantic_dedup blocking vs the guarded
# semantic_dedup_pairs, plus planted-duplicate recall under the guard.
from financial_data_science_spark.functions.semdedup import (
    kmeans_cell_split,
    semantic_dedup_pairs,
)

base_rows = emb.select("vec_id", "embedding").toPandas()
nbase = len(base_rows)
nblob = int(0.3 * nbase / 0.7)          # blob = 30% of the augmented corpus
center = np.array(base_rows.iloc[0]["embedding"], dtype=float)
CAP, NSUB, W = 64, 8, 8

for kind in ("spread", "pointmass"):
    rng = np.random.default_rng(29)
    scale = np.linalg.norm(center) / np.sqrt(len(center))
    jit = 0.30 * scale if kind == "spread" else 1e-6
    blob = [
        (2_000_000 + j, [float(x) for x in center + rng.normal(0, jit, len(center))])
        for j in range(nblob)
    ]
    aug2 = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(pd.DataFrame(blob, columns=["vec_id", "embedding"]))
    ).localCheckpoint(eager=True)
    n2 = aug2.count()

    def pair_budget(binned_df, cap=None, w=None):
        sizes = binned_df.groupBy("cluster").count().toPandas()["count"]
        if cap is None:
            return int((sizes * (sizes - 1) // 2).sum())
        return int(sum(
            c * (c - 1) // 2 if c <= cap else c * w for c in sizes
        ))

    t0 = time.time()
    idx = ivf_build_index(aug2, nlist=8, iters=3, train_mod=4, persist=True)
    plain_pairs = pair_budget(idx["binned"])
    t_plain = time.time() - t0
    t0 = time.time()
    cells = kmeans_cell_split(
        idx["binned"], cap=CAP, nsub=NSUB, sub_iters=2, max_depth=2
    ).localCheckpoint(eager=True)
    guarded_pairs = pair_budget(cells, cap=CAP, w=W)
    maxcell = int(cells.groupBy("cluster").count().agg(
        F.max("count")).collect()[0][0])
    t_guard = time.time() - t0
    t0 = time.time()
    out = semantic_dedup_pairs(
        aug2, nlist=8, iters=3, train_mod=4, tau=0.9, cap=CAP, nsub=NSUB,
        sub_iters=2, max_depth=2, budget_w=W,
    )
    npairs = out.count()
    ntrunc = out.filter(F.col("truncated")).count()
    t_e2e = time.time() - t0
    print(
        f"SKEW {kind:9s} n={n2} blob={nblob} | plain within-cell pairs="
        f"{plain_pairs} ({t_plain:.1f}s build) | guarded pair budget="
        f"{guarded_pairs} max cell={maxcell} ({t_guard:.1f}s split) | "
        f"e2e tau=0.9 pairs={npairs} truncated={ntrunc} ({t_e2e:.1f}s)",
        flush=True,
    )


# ---- structured-mega-cell arm (r12): 8 distinct template families
# sharing one region — the mega-cell with REAL substructure (the
# boilerplate-families case the splitter exists for).  Isotropic blobs
# above defeat Lloyd by construction (means collapse to the center —
# there is no substructure to find; the budget arm bounds those); here
# the split must actually separate the families.
rng = np.random.default_rng(31)
scale = np.linalg.norm(center) / np.sqrt(len(center))
fam_centers = []
for f in range(8):
    c = center.copy()
    c[f * 8:(f + 1) * 8] += 1.5 * scale   # disjoint coordinate blocks
    fam_centers.append(c)
blob = [
    (2_000_000 + j, [float(x) for x in
                     fam_centers[j % 8] + rng.normal(0, 0.05 * scale, len(center))])
    for j in range(nblob)
]
aug3 = emb.select("vec_id", "embedding").unionByName(
    spark.createDataFrame(pd.DataFrame(blob, columns=["vec_id", "embedding"]))
).localCheckpoint(eager=True)
idx = ivf_build_index(aug3, nlist=8, iters=3, train_mod=4, persist=True)
pre = idx["binned"].groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
t0 = time.time()
cells = kmeans_cell_split(
    idx["binned"], cap=CAP, nsub=NSUB, sub_iters=2, max_depth=2
).localCheckpoint(eager=True)
post = cells.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
# family purity of the blob's sub-cells: members of one family should
# co-locate (split quality, not just size)
fam = cells.filter(F.col("vec_id") >= 2_000_000).select(
    "cluster", (F.col("vec_id") % 8).alias("fam"))
purity = (fam.groupBy("cluster", "fam").count()
          .groupBy("cluster").agg(F.max("count").alias("top"),
                                  F.sum("count").alias("tot"))
          .agg(F.sum("top").alias("t"), F.sum("tot").alias("n")).collect()[0])
print(
    f"MULTIBLOB n={aug3.count()} families=8 | max cell pre-split={pre} "
    f"post-split={post} | blob sub-cell family purity="
    f"{purity['t']}/{purity['n']}={purity['t']/purity['n']:.3f} "
    f"({time.time()-t0:.1f}s split)",
    flush=True,
)


# r13/r14 arms (each runnable alone via
# SPARK_GRAFT_SEMDEDUP_ARMS=probe_recall,drift,sdidx,rebuild_cycle)
sdidx_arm()
probe_recall_arm()
drift_arm()
rebuild_cycle_arm()
