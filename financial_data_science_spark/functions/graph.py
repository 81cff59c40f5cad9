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
