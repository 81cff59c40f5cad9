"""Graph analytics on edge DataFrames (reference recipes/graph.py:36-317).

The reference builds networkx graphs from edge lists (supplier→customer
pairs, pstat.py:347-363).  GraphFrames jars are not in this image, so the
core measures are implemented directly as DataFrame iterations — each
PageRank sweep is one join + one aggregation, the classic Pregel-as-SQL
shape that scales to billions of edges (networkx does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """In/out/total degree per vertex."""
    out_d = edges.groupBy(F.col(src).alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_d = edges.groupBy(F.col(dst).alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        out_d.join(in_d, "id", "outer")
        .fillna(0, subset=["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Iterative PageRank: rank_{t+1} = (1-d)/N + d * sum(rank/outdeg).

    Each sweep: join ranks to edges on src (one shuffle), aggregate
    contributions on dst (one shuffle).  Lineage is truncated with
    localCheckpoint every few sweeps so plans don't grow unboundedly —
    the standard iterative-algorithm discipline on Spark.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # localCheckpoint (not cache) on the loop-invariant sides: iterated
    # self-referencing joins re-alias attribute ids, which defeats cache
    # lookup and silently re-executes the full upstream lineage every
    # sweep (measured 20x slowdown); an RDD checkpoint truncates lineage
    # unconditionally.  On a cluster, checkpoint() to reliable storage is
    # the executor-loss-safe variant of the same discipline.
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_w = e.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = verts.withColumn("rank", F.lit(1.0 / n))
    for i in range(max_iter):
        contribs = (
            e_w.join(ranks, e_w.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            verts.join(contribs, verts.id == contribs.dst, "left")
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce("csum", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Label propagation to min-vertex-id per component — the dedup
    'cluster the near-dup pairs' step in an LLM pipeline (union-find as
    iterated joins; converges in O(diameter) sweeps)."""
    # Loop-invariant edge set and per-iteration labels are materialized
    # with localCheckpoint: iterated self-joins re-alias attribute ids and
    # miss the cache, re-executing the (possibly expensive — e.g. LSH
    # near-dup) upstream lineage every sweep.  Checkpoint FIRST, then test
    # convergence on the materialized result, so each sweep runs exactly
    # once.  Convergence test is join-free: min-propagation only ever
    # lowers labels, so sum(comp) is strictly decreasing until fixpoint.
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        e.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    total = labels.agg(F.sum("comp")).collect()[0][0]
    for i in range(max_iter):
        neighbor_min = (
            e.join(labels, e.b == labels.id)
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        new_total = new_labels.agg(F.sum("comp")).collect()[0][0]
        labels = new_labels
        if new_total == total:
            break
        total = new_total
    return labels


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Symmetric deduped neighbor list (a, b), self-loops dropped."""
    return (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def link_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 1,
    mode: str = "all",
) -> DataFrame:
    """Link-prediction scores for 2-hop pairs (reference
    recipes/graph.py:286-317 link_prediction): common neighbors, Jaccard
    coefficient, Adamic-Adar, resource allocation, preferential
    attachment.

    Scale shape: the candidate set is generated by the 2-hop self-join
    (pairs sharing >=1 neighbor) — exactly the pairs where the
    common-neighbor scores are nonzero — never the all-pairs non-edge set
    networkx enumerates (O(V^2) is unrunnable at scale; preferential
    attachment is reported on the same candidate set).  ``min_common``
    prunes the hub-driven candidate explosion: raise it on graphs with
    high-degree hubs.

    ``mode='all'``: undirected graph, candidates are non-adjacent pairs
    (existing edges anti-joined away).  ``mode='src_side'``: bipartite
    projection — score pairs of SOURCE-side entities through shared
    destination neighbors (e.g. supplier pairs through shared customers);
    endpoint degree = out-degree, shared-neighbor degree = in-degree, and
    no anti-join (src-src edges are a different relation).  The
    projection caps the 2-hop blowup at sum(in_deg^2) instead of
    sum(deg^2) — the difference between 1.7M and 27M intermediate rows on
    the sf0.01 supply graph.  AA/RA divide by shared-neighbor degree,
    >= 2 by construction, so log/ratio are always defined.
    """
    if mode == "src_side":
        ez = edges.select(F.col(src).alias("u"), F.col(dst).alias("z")).distinct()
        deg = ez.groupBy(F.col("u").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        degz = ez.groupBy("z").agg(F.count(F.lit(1)).alias("degz"))
        l = ez
        r = ez.select(F.col("u").alias("v"), "z")
    else:
        ue = _undirected(edges, src, dst)
        deg = ue.groupBy(F.col("a").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        degz = deg.select(F.col("id").alias("z"), F.col("deg").alias("degz"))
        l = ue.select(F.col("a").alias("u"), F.col("b").alias("z"))
        r = ue.select(F.col("a").alias("v"), F.col("b").alias("z"))
    # 2-hop: (u -z- v), one shuffle on the shared neighbor z
    hop2 = (
        l.join(r, "z")
        .filter(F.col("u") < F.col("v"))
        .join(degz, "z")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(1.0 / F.log("degz")).alias("adamic_adar"),
            F.sum(1.0 / F.col("degz")).alias("resource_alloc"),
        )
        .filter(F.col("cn") >= min_common)
    )
    if mode != "src_side":  # drop existing edges
        hop2 = hop2.join(
            ue.select(F.col("a").alias("u"), F.col("b").alias("v")),
            ["u", "v"],
            "left_anti",
        )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    return (
        hop2.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            (F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn"))).alias(
                "jaccard"
            ),
            "adamic_adar",
            "resource_alloc",
            (F.col("du") * F.col("dv")).alias("pref_attach"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
) -> DataFrame:
    """Deterministic synchronous label-propagation community detection
    (reference recipes/graph.py:235-263 community_detection 'label').

    Every node starts with its own id as label; each sweep it adopts the
    most frequent neighbor label, ties broken by the smallest label
    (networkx resolves ties randomly — fixed tiebreak + fixed iteration
    count make the result reproducible, which the synchronous variant
    needs anyway since it can oscillate on bipartite structures).  Each
    sweep is one join + one count + one argmin window — the same
    Pregel-as-SQL shape as pagerank, localCheckpoint discipline included.
    """
    from pyspark.sql import Window

    ue = _undirected(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        ue.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("lab", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        cnt = (
            ue.join(labels, ue.b == labels.id)
            .groupBy("a", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("a").orderBy(F.col("c").desc(), F.col("lab"))
        best = (
            cnt.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .select(F.col("a").alias("id"), F.col("lab").alias("blab"))
        )
        labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce("blab", "lab").alias("lab"))
            .localCheckpoint(eager=True)
        )
    return labels
