"""Graph analytics on edge DataFrames (reference recipes/graph.py:36-317).

The reference builds networkx graphs from edge lists (supplier→customer
pairs, pstat.py:347-363).  GraphFrames jars are not in this image, so the
core measures are implemented directly as DataFrame iterations — each
PageRank sweep is one join + one aggregation, the classic Pregel-as-SQL
shape that scales to billions of edges (networkx does not).

Coverage vs reference nodes_centrality (recipes/graph.py:185-231):
degree, eigenvector, pagerank, hub/authority (HITS), closeness (for a
queried source subset; all-vertex closeness is O(V*E*diam) — at cluster
scale run it on the vertices you need or landmark-sample), and
betweenness via source-sampled Brandes (``betweenness_sampled``: exact
when given every vertex as a source, the standard unbiased (n/k)
landmark estimate otherwise).  Exact ALL-pairs betweenness stays out of
reach by design — V synchronized BFS+backprop rounds is a dedicated
system at 100 TB — but the sampled form covers the realistic use and
degrades gracefully: cost is k-sources x diameter join+agg rounds.
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
    checkpoint_every: int = 3,
) -> DataFrame:
    """Iterative PageRank: rank_{t+1} = (1-d)/N + d * sum(rank/outdeg).

    Each sweep: join ranks to edges on src (one shuffle), aggregate
    contributions on dst (one shuffle).  Lineage is truncated with
    localCheckpoint every few sweeps so plans don't grow unboundedly —
    the standard iterative-algorithm discipline on Spark.

    Cadence trade (measured at sf0.1, 8 sweeps): every=8 (one deep lazy
    plan) 5.5s, every=1 (a job per sweep) 4.4s, every=2-3 ~3s — at test
    scale Catalyst optimize/codegen time on the deep plan dominates, so
    frequent truncation wins.  On a huge graph the rank-frame
    materialization (O(V) per checkpoint) grows while the plan-depth
    cost stays fixed, pushing the optimum up — hence the knob.
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


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "id",
    damping: float = 0.85,
    max_iter: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Personalized PageRank: teleport mass (1-d) returns ONLY to the
    ``sources`` set instead of uniformly — rank becomes proximity to the
    seeds (the recommendation / related-entities variant of the same
    Pregel-as-SQL sweeps).  Init = 1/|S| on the seeds, 0 elsewhere; same
    join+aggregate per sweep and the same lineage-checkpoint cadence as
    :func:`pagerank`.

    Seeds absent from the edge set are EXCLUDED before normalizing (and
    all-out-of-graph seeds raise ValueError) so teleport mass is never
    allotted to phantom nodes.  Like :func:`pagerank`, this is the
    simplified variant that does NOT redistribute dangling-node mass:
    on graphs with many sink nodes ranks sum to < 1 (relative ordering,
    the quantity users consume, is unaffected)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # count only seeds PRESENT in the graph: out-of-graph seeds would
    # otherwise inflate ns while the verts join drops them, leaking
    # teleport mass so ranks no longer sum to ~1
    seeds = (
        sources.select(F.col(source_col).alias("id"))
        .distinct()
        .join(verts, "id", "left_semi")
    )
    ns = seeds.count()
    if ns == 0:
        raise ValueError(
            "personalized_pagerank: no seed appears in the edge set "
            "(empty or fully out-of-graph sources frame)"
        )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_w = e.join(out_deg, "src").localCheckpoint(eager=True)
    tagged = verts.join(
        F.broadcast(seeds.withColumn("__s__", F.lit(1))), "id", "left"
    ).localCheckpoint(eager=True)
    is_seed = F.col("__s__").isNotNull()
    base = F.when(is_seed, F.lit((1.0 - damping) / ns)).otherwise(F.lit(0.0))
    ranks = tagged.select(
        "id",
        F.when(is_seed, F.lit(1.0 / ns)).otherwise(F.lit(0.0)).alias("rank"),
    )
    for i in range(max_iter):
        contribs = (
            e_w.join(ranks, e_w.src == ranks.id)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            tagged.join(contribs, tagged.id == contribs.dst, "left")
            .select(
                "id",
                (
                    base + F.lit(damping) * F.coalesce("csum", F.lit(0.0))
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


def eigenvector_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 8,
    checkpoint_every: int = 2,
) -> DataFrame:
    """Eigenvector centrality by power iteration (reference
    recipes/graph.py:210-222 nodes_centrality 'eigenvector').

    Follows the networkx update x_{t+1} = (I + A) x_t on the undirected
    graph — the +I shift guarantees convergence on bipartite structures
    (plain A x oscillates) — then L2-normalizes each sweep.  The
    normalizer is a one-row aggregate crossJoined back in (stays in the
    plan; no driver round-trip per sweep), and lineage is truncated with
    localCheckpoint like pagerank.  Fixed iteration count keeps the
    result engine-reproducible for the oracle.
    """
    ue = _undirected(edges, src, dst).localCheckpoint(eager=True)
    verts = ue.select(F.col("a").alias("id")).distinct().localCheckpoint(eager=True)
    n = verts.count()
    x = verts.withColumn("x", F.lit(1.0 / n))
    for i in range(max_iter):
        nbr = (
            ue.join(x, ue.b == x.id)
            .groupBy("a")
            .agg(F.sum("x").alias("nx"))
        )
        y = (
            x.join(nbr, x.id == nbr.a, "left")
            .select("id", (F.col("x") + F.coalesce("nx", F.lit(0.0))).alias("y"))
        )
        norm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
        x = y.crossJoin(norm).select("id", (F.col("y") / F.col("nrm")).alias("x"))
        if (i + 1) % checkpoint_every == 0:
            x = x.localCheckpoint(eager=True)
    return x.select("id", F.col("x").alias("eigenvector"))


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 8,
    checkpoint_every: int = 2,
) -> DataFrame:
    """HITS hub/authority scores (reference recipes/graph.py:222
    nodes_centrality 'hub'/'authority').

    networkx semantics on the directed graph: per sweep
    ``auth = A' hub`` then ``hub = A auth``, each max-normalized; final
    scores sum-normalized.  Every step is a join + aggregation; the
    normalizers are one-row aggregates crossJoined back (in-plan).
    Vertices with no in-edges get authority 0, no out-edges hub 0.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    h = verts.withColumn("h", F.lit(1.0 / n))
    a = None
    for i in range(max_iter):
        a_raw = (
            e.join(h, e.src == h.id)
            .groupBy("dst")
            .agg(F.sum("h").alias("ar"))
        )
        a = (
            verts.join(a_raw, verts.id == a_raw.dst, "left")
            .select("id", F.coalesce("ar", F.lit(0.0)).alias("a"))
        )
        amax = a.agg(F.max("a").alias("mx"))
        a = a.crossJoin(amax).select("id", (F.col("a") / F.col("mx")).alias("a"))
        h_raw = (
            e.join(a, e.dst == a.id)
            .groupBy("src")
            .agg(F.sum("a").alias("hr"))
        )
        h = (
            verts.join(h_raw, verts.id == h_raw.src, "left")
            .select("id", F.coalesce("hr", F.lit(0.0)).alias("h"))
        )
        hmax = h.agg(F.max("h").alias("mx"))
        h = h.crossJoin(hmax).select("id", (F.col("h") / F.col("mx")).alias("h"))
        if (i + 1) % checkpoint_every == 0:
            a = a.localCheckpoint(eager=True)
            h = h.localCheckpoint(eager=True)
    hsum = h.agg(F.sum("h").alias("s"))
    asum = a.agg(F.sum("a").alias("s"))
    hn = h.crossJoin(hsum).select("id", (F.col("h") / F.col("s")).alias("hub"))
    an = a.crossJoin(asum).select("id", (F.col("a") / F.col("s")).alias("authority"))
    return hn.join(an, "id")


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "lab",
) -> DataFrame:
    """Per-community modularity contributions on the undirected graph
    (reference recipes/graph.py:268-285 community_quality 'modularity').

    Q_c = L_c/m - (k_c/2m)^2 where L_c = intra-community edges, k_c = sum
    of member degrees, m = total undirected edges.  One labels join per
    edge endpoint + one groupBy — no iteration.  Also reports members and
    intra-pair counts for the coverage/performance metrics.
    """
    # canonical undirected edge list (one row per edge, a < b after dedup)
    ue = _undirected(edges, src, dst).filter(F.col("a") < F.col("b"))
    lab_a = labels.select(
        F.col(id_col).alias("a"), F.col(label_col).alias("la")
    )
    lab_b = labels.select(
        F.col(id_col).alias("b"), F.col(label_col).alias("lb")
    )
    tagged = ue.join(lab_a, "a").join(lab_b, "b")
    m_row = tagged.agg(F.count(F.lit(1)).alias("m"))
    intra = (
        tagged.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("community"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    deg = (
        _undirected(edges, src, dst)
        .groupBy(F.col("a").alias("vid"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ksum = (
        labels.join(deg, labels[id_col] == deg.vid, "left")
        .groupBy(F.col(label_col).alias("community"))
        .agg(
            F.sum(F.coalesce("deg", F.lit(0))).alias("degree_sum"),
            F.count(F.lit(1)).alias("members"),
        )
    )
    return (
        ksum.join(intra, "community", "left")
        .fillna(0, subset=["internal_edges"])
        .crossJoin(m_row)
        .select(
            "community",
            "members",
            "internal_edges",
            "degree_sum",
            (
                F.col("internal_edges") / F.col("m")
                - (F.col("degree_sum") / (2.0 * F.col("m"))) ** 2
            ).alias("contribution"),
        )
    )


def community_quality(
    edges: DataFrame,
    labels: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "lab",
) -> DataFrame:
    """One-row partition quality summary (reference graph.py:268-285):
    community count, modularity, coverage (intra-edge fraction), and
    performance ((intra-edges + inter non-edges) / all pairs) — the
    networkx partition_quality pair."""
    per = modularity(edges, labels, src, dst, id_col, label_col)
    m_edges = (
        _undirected(edges, src, dst).filter(F.col("a") < F.col("b"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    n_nodes = labels.agg(F.count(F.lit(1)).alias("n"))
    agg = per.agg(
        F.count(F.lit(1)).alias("communities"),
        F.sum("contribution").alias("modularity"),
        F.sum("internal_edges").alias("intra_edges"),
        F.sum(F.col("members") * (F.col("members") - 1) / 2).alias("intra_pairs"),
    )
    return (
        agg.crossJoin(m_edges)
        .crossJoin(n_nodes)
        .select(
            "communities",
            "modularity",
            (F.col("intra_edges") / F.col("m")).alias("coverage"),
            (
                (
                    F.col("intra_edges")
                    + (
                        F.col("n") * (F.col("n") - 1) / 2
                        - F.col("intra_pairs")
                        - (F.col("m") - F.col("intra_edges"))
                    )
                )
                / (F.col("n") * (F.col("n") - 1) / 2)
            ).alias("performance"),
        )
    )


def closeness_centrality(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "id",
    hops: int = 8,
) -> DataFrame:
    """Exact closeness centrality for the given source vertices
    (reference recipes/graph.py:225-228 nodes_centrality 'closeness'),
    distances capped at ``hops`` (set >= graph diameter for exactness).

    Multi-source BFS: state is a (source, node, dist) frame; each sweep
    joins the frontier to the edge list and min-merges — k sources cost
    k parallel BFS sharing the same shuffles, so per-source cost amortizes.
    All-vertex closeness is O(V*E*diam) — at cluster scale compute it for
    the vertex subset you need (or landmark-sample); exact all-pairs
    betweenness (Brandes) needs per-source dependency back-propagation on
    top of this and is deliberately NOT implemented — see module notes.

    Uses the Wasserman-Faust improved formula (networkx default):
    c(s) = ((r-1)/(n-1)) * ((r-1)/sum_dist) with r = vertices reached.
    """
    ue = _undirected(edges, src, dst).localCheckpoint(eager=True)
    n_nodes = (
        ue.select(F.col("a").alias("id")).distinct().count()
    )
    seed = sources.select(F.col(source_col).alias("s")).distinct()
    dist = seed.select("s", F.col("s").alias("node"), F.lit(0).alias("d"))
    dist = dist.localCheckpoint(eager=True)
    frontier = dist
    for k in range(1, hops + 1):
        # expand the frontier then min-merge with known distances — the
        # groupBy-min is the simplest correct merge (an anti-join against
        # visited would save re-aggregating but self-referencing joins on
        # checkpointed frames re-alias attribute ids and get brittle)
        expanded = (
            frontier.join(ue, frontier.node == ue.a)
            .select("s", F.col("b").alias("node"), F.lit(k).alias("d"))
        )
        merged = (
            dist.union(expanded)
            .groupBy("s", "node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
        # new frontier = nodes first reached this sweep
        frontier = merged.filter(F.col("d") == k)
        if frontier.isEmpty():
            dist = merged
            break
        dist = merged
    per_src = dist.filter(F.col("node") != F.col("s")).groupBy("s").agg(
        F.count(F.lit(1)).alias("r_minus_1"),
        F.sum("d").alias("sum_dist"),
    )
    return per_src.select(
        F.col("s").alias("id"),
        (
            (F.col("r_minus_1") / F.lit(n_nodes - 1))
            * (F.col("r_minus_1") / F.col("sum_dist"))
        ).alias("closeness"),
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-vertex triangle counts (reference recipes/graph.py:206
    nodes_centrality 'triangles').

    Canonical-order enumeration: each triangle a<b<c is emitted exactly
    once by joining the (a<b) edge list to itself on the shared middle
    vertex and closing with a third join — never the per-node
    neighborhood cross product.  On skewed graphs swap the id order for
    (degree, id) order so hubs sit on the small side of the wedge join;
    the join shape is unchanged.  Vertices in no triangle get 0.
    """
    ue = _undirected(edges, src, dst)
    e = ue.filter(F.col("a") < F.col("b")).localCheckpoint(eager=True)
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = ab.join(bc, "y")  # x < y < z by construction
    tri = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    per_node = (
        tri.select(F.col("x").alias("id"))
        .union(tri.select(F.col("y").alias("id")))
        .union(tri.select(F.col("z").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    verts = e.select(F.col("a").alias("id")).union(
        e.select(F.col("b").alias("id"))
    ).distinct()
    return (
        verts.join(per_node, "id", "left").fillna(0, subset=["triangles"])
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient 2T(v)/(deg(v)(deg(v)-1)) (reference
    recipes/graph.py:206 nodes_centrality 'clustering'); 0 for degree<2
    vertices (networkx convention)."""
    tri = triangles(edges, src, dst)
    deg = (
        _undirected(edges, src, dst)
        .groupBy(F.col("a").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return tri.join(deg, "id").select(
        "id",
        "triangles",
        F.when(
            F.col("deg") >= 2,
            2.0 * F.col("triangles") / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(0.0)
        .alias("clustering"),
    )


def graph_info(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One-row undirected-graph summary (reference recipes/graph.py:45-95
    graph_info): nodes, edges, density, transitivity (3*triangles /
    wedges), average clustering, connected-component count and largest
    size.  Triangles/components reuse the existing distributed kernels;
    everything else is one aggregate over the degree frame."""
    ue = _undirected(edges, src, dst).localCheckpoint(eager=True)
    canon = ue.filter(F.col("a") < F.col("b"))
    deg = ue.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    base = deg.agg(
        F.count(F.lit(1)).alias("nodes"),
        (F.sum("deg") / 2).cast("long").alias("edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("wedges"),
    )
    tri_total = clustering_coefficient(ue, "a", "b").agg(
        (F.sum("triangles") / 3).cast("long").alias("tri"),
        F.avg("clustering").alias("average_clustering"),
    )
    comp = connected_components(canon, "a", "b")
    comp_stats = (
        comp.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("sz").alias("largest_component"),
        )
    )
    return (
        base.crossJoin(tri_total)
        .crossJoin(comp_stats)
        .select(
            "nodes",
            "edges",
            (2.0 * F.col("edges") / (F.col("nodes") * (F.col("nodes") - 1))).alias("density"),
            F.when(F.col("wedges") > 0, 3.0 * F.col("tri") / F.col("wedges"))
            .otherwise(0.0)
            .alias("transitivity"),
            "average_clustering",
            "n_components",
            "largest_component",
        )
    )


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Vertices of the undirected k-core (iterative peeling: repeatedly
    drop vertices with degree < k until a fixpoint) — the standard
    subgraph-quality filter for dense-community extraction.

    Each sweep is one degree aggregate + one semi-join on the surviving
    edge set, localCheckpoint'ed; convergence test is the (monotone
    decreasing) surviving-vertex count, a join-free scalar.  Converges in
    O(peeling-depth) sweeps.
    """
    ue = _undirected(edges, src, dst).localCheckpoint(eager=True)
    n_prev = None
    for _ in range(max_iter):
        deg = ue.groupBy(F.col("a").alias("id")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        keep = deg.filter(F.col("deg") >= k).select("id")
        n = keep.count()
        if n == 0:
            return keep
        if n_prev is not None and n == n_prev:
            break
        n_prev = n
        ue = (
            ue.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return ue.select(F.col("a").alias("id")).distinct()


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient of the undirected graph: the
    Pearson correlation of endpoint degrees over the directed edge list
    (Newman 2002) — one degree aggregate, two joins, one corr()."""
    ue = _undirected(edges, src, dst)
    deg = ue.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    return ue.join(da, "a").join(db, "b").agg(
        F.corr("da", "db").alias("assortativity")
    )


def betweenness_sampled(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    source_col: str = "id",
    hops: int = 8,
    normalized: bool = True,
    round_dp: int = 6,
) -> DataFrame:
    """Source-sampled Brandes betweenness centrality on the undirected
    graph (reference recipes/graph.py:224 ``nx.betweenness_centrality`` —
    the one centrality the module previously excluded; this is the
    landmark-sampled approximation the module notes called for).

    Brandes (2001) per source s: a level-synchronous BFS accumulates
    shortest-path counts sigma, then dependencies back-propagate level by
    level: delta(v) = sum over successors w of sigma_v/sigma_w *
    (1 + delta(w)).  Estimator: bc(v) = (n/k) * sum_s delta_s(v), halved
    for the undirected double-count, normalized by (n-1)(n-2)/2 — with
    ``sources`` = all vertices this is EXACT nx betweenness; with a fixed
    k-subset it is the standard unbiased source-sampling estimate.

    Scale shape: all k sources share every sweep's joins (the same
    multi-source amortization as closeness_centrality); each BFS level
    and each backprop level is one equi-join + one aggregation on the
    (s, node) key — diameter-many rounds, never all-pairs.  Sources are
    caller-fixed (deterministic), so the oracle replays the identical
    computation; per-level deltas are rounded to ``round_dp`` to keep the
    cross-engine float sums on a comparable grid.
    """
    ue = _undirected(edges, src, dst).localCheckpoint(eager=True)
    n_nodes = ue.select(F.col("a").alias("id")).distinct().count()
    seed = sources.select(F.col(source_col).alias("s")).distinct()
    k_sources = seed.count()
    level = seed.select(
        "s", F.col("s").alias("node"), F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [level]
    visited = level.select("s", "node")
    for _ in range(1, hops + 1):
        # candidates via one frontier x edges join; sigma of a new node =
        # sum of parent sigmas (all frontier parents are on shortest paths)
        cand = level.join(ue, level.node == ue.a).select(
            "s", F.col("b").alias("node"), "sigma"
        )
        nxt = (
            cand.join(visited, ["s", "node"], "left_anti")
            .groupBy("s", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        visited = visited.union(nxt.select("s", "node"))
        level = nxt
    # dependency back-propagation, deepest level first (delta there = 0)
    delta = levels[-1].select("s", "node", F.lit(0.0).alias("delta"))
    acc = [delta] if len(levels) > 1 else []
    for L in range(len(levels) - 2, 0, -1):
        deeper = levels[L + 1].join(delta, ["s", "node"]).select(
            "s",
            F.col("node").alias("w"),
            F.col("sigma").alias("sigma_w"),
            F.col("delta").alias("delta_w"),
        )
        vlev = levels[L]
        nb = vlev.join(ue, vlev.node == ue.a).select(
            "s", "node", "sigma", F.col("b").alias("w")
        )
        contrib = (
            nb.join(deeper, ["s", "w"])
            .groupBy("s", "node")
            .agg(
                F.round(
                    F.sum(F.col("sigma") / F.col("sigma_w") * (1 + F.col("delta_w"))),
                    round_dp,
                ).alias("delta")
            )
        )
        delta = (
            vlev.select("s", "node")
            .join(contrib, ["s", "node"], "left")
            .withColumn("delta", F.coalesce(F.col("delta"), F.lit(0.0)))
            .localCheckpoint(eager=True)
        )
        acc.append(delta)
    if not acc:
        return ue.sparkSession.createDataFrame([], "id long, betweenness double")
    from functools import reduce

    raw = (
        reduce(lambda a, b: a.unionByName(b), acc)
        .groupBy(F.col("node").alias("id"))
        .agg(F.sum("delta").alias("raw"))
    )
    scale = float(n_nodes) / float(k_sources) / 2.0
    if normalized:
        scale = scale / ((n_nodes - 1) * (n_nodes - 2) / 2.0)
    return raw.select(
        "id", F.round(F.col("raw") * F.lit(scale), round_dp).alias("betweenness")
    )
