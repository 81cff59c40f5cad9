"""Similarity & deduplication operators: cosine ANN, MinHash-LSH, SimHash,
n-gram Jaccard.

First-class large-scale training-data-pipeline components (BASELINE.json
north star).  Design notes per operator:

  - exact dedup: hash-groupBy on a normalization key — one shuffle.
  - n-gram Jaccard: inverted index (explode shingles) -> equi-join on
    shingle -> count common -> |A∪B| = |A|+|B|-common.  The shingle join is
    the scalable alternative to an all-pairs cross join.
  - MinHash+LSH: k independent min-hashes from one xxhash64(seed, shingle)
    family, banded into b buckets; candidate pairs = equi-join on
    (band, band_hash).  Only candidates are verified — never all pairs.
  - SimHash: sign-aggregated 64-bit token hash; near-dup = small Hamming
    distance on band-partitioned candidates.
  - cosine ANN: brute-force top-k via broadcast of the (small) query side;
    LSH-bucketed variant via random-hyperplane signs for the scale path.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_data_science_spark.functions.text import word_shingles


# ---------------------------------------------------------------- cosine

def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


_FLAT_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_FLAT_MIN_BYTES", 64 * 1024 * 1024)
)


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Array length of ``vec_col`` from ONE driver-side row — a bounded
    peek (same class as the centroid/meta collects in this module), paid
    at plan-build time.  Returns 0 on an empty frame, a null vector, or
    a STREAMING frame (no eager job possible) so callers fall back to
    the array-fold formulation.

    Input contract (r15, flagged by the r14 advisor): the flat-unpacked
    scoring paths gated on this peek assume UNIFORM vector dims.  A row
    whose array is SHORTER than the peeked dim nulls out exactly like
    the fold (missing getItem -> null product -> null sum); a row
    LONGER than the peeked dim would score on its dim-prefix where the
    fold nulls the pair (zip_with pads the shorter side) — so ragged
    inputs mixing lengths ABOVE the peeked dim are outside the
    contract.  Callers that must serve ragged corpora should pass the
    fold path explicitly (dim=0).  Every embedding table in this repo
    (and any real ANN corpus) is fixed-dim."""
    if df.isStreaming:
        return 0
    row = df.select(F.size(F.col(vec_col)).alias("n")).first()
    return int(row["n"]) if row is not None and row["n"] is not None else 0


def _flat_gate(df: DataFrame, dim: int) -> int:
    """SIZE-gate for flat-chain scoring: ``dim`` when ``df``'s optimizer
    size estimate reaches ``SPARK_GRAFT_FLAT_MIN_BYTES`` (default
    64 MiB), else 0 (callers fall back to the interpreted fold).

    Measured rationale (r15): a dim-unrolled multiply-add chain is a
    fixed ~5*dim-node expression at EVERY scoring site — it wins per
    ROW (whole-stage codegen vs an interpreted HOF fold) but pays a
    fixed per-STAGE planning/AQE-replan cost for the bloated tree.  On
    the sf0.1 bench corpora (2k vectors) that fixed cost exceeds the
    per-row savings in the small ANN query paths (ann_sq8_topk measured
    ~3x slower flat; the semdedup probes ~1.6x), while on large scored
    sets it dominates the other way (embedding_near_dups's 356k-pair
    scoring measured 2.6s fold -> sub-second flat in r14).  Gating on
    the corpus-side size estimate keeps the toy-scale plan lean and
    turns the flat chains on exactly where they pay: the estimate is
    driver metadata (no job), and unknown estimates (streaming/RDD
    lineages) fall back to the fold.  Env-tunable for clusters whose
    planning-to-compute balance differs."""
    if dim <= 0:
        return 0
    try:
        from financial_data_science_spark.operators.layout import (
            _plan_size_bytes,
        )

        size = _plan_size_bytes(df)
    except Exception:  # pragma: no cover
        return 0
    return dim if size >= _FLAT_MIN_BYTES else 0


def _flat_norm(vec: Column, dim: int) -> Column:
    """L2 norm as a flat codegen multiply-add chain over ``vec[i]`` —
    the dim-known replacement for the interpreted ``norm`` fold.
    sqrt(((0.0 + v0*v0) + v1*v1) + ...) is the SAME IEEE addition
    sequence as the ``dot(a, a)`` fold, so the double is bit-identical
    (the ``_flat_dot`` argument applied to the self-dot)."""
    acc = F.lit(0.0)
    for i in range(dim):
        v = vec.getItem(i).cast("double")
        acc = acc + v * v
    return F.sqrt(acc)


def _flat_dot_arr(a: Column, b: Column, dim: int) -> Column:
    """Dot product as a flat codegen chain DIRECTLY over two array
    columns (``a[i]*b[i]`` via getItem) — for scoring projections where
    both arrays are already in the row (post-join), so no named-column
    unpack is needed.  Same IEEE addition sequence as the ``dot`` fold
    (see ``_flat_dot``), so scores are bit-identical; a missing element
    (null/short array) nulls the chain exactly as the fold does."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc


def _flat_cols(vec: Column, prefix: str, dim: int) -> list:
    """``dim`` double columns ``__<prefix>0__..`` unpacked from an array
    column — the codegen-friendly carrier for exact scoring (see
    :func:`_flat_dot`).  A missing element (null/ragged array) becomes a
    null column, which nulls any product chain exactly as the zip_with
    fold nulls its sum."""
    return [
        vec.getItem(i).cast("double").alias(f"__{prefix}{i}__")
        for i in range(dim)
    ]


def _flat_dot(pl: str, pr: str, dim: int) -> Column:
    """Dot product over flat-unpacked columns as a left-to-right
    multiply-add chain.  The array fold (:func:`dot`) is a higher-order
    function — CodegenFallback, interpreted per element, the measured
    wall of every exact-scoring stage — while this chain compiles under
    whole-stage codegen.  ((0.0 + l0*r0) + l1*r1) + ... is the same
    IEEE addition sequence as the fold, so scores are BIT-IDENTICAL."""
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.col(f"__{pl}{i}__") * F.col(f"__{pr}{i}__")
    return acc


def _flat_sqdist(pl: str, pr: str, dim: int) -> Column:
    """Squared L2 over flat-unpacked columns — same chain argument as
    :func:`_flat_dot`, bit-identical to the :func:`sqdist` fold."""
    acc = F.lit(0.0)
    for i in range(dim):
        d = F.col(f"__{pl}{i}__") - F.col(f"__{pr}{i}__")
        acc = acc + d * d
    return acc


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_id: str = "query_id",
    round_dp: int | None = None,
) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries, score every corpus row,
    window top-k.  Exact baseline; O(|Q|·|C|) score rows but only the
    queries side is replicated.  ``round_dp`` snaps scores to a decimal
    grid BEFORE the ranking — pass 6 when the ranking is compared across
    engines (the repo-wide round-before-argmax discipline) so a
    cross-engine ulp at a near-tie cannot flip top-k membership."""
    from financial_data_science_spark.operators.layout import fan_out_scan

    # norms hoisted per SIDE (bit-identical to per-pair cosine(): the
    # self-dot fold yields the same double wherever it runs, and
    # sqrt / * / / are correctly rounded — see embedding_near_dups):
    # |Q| + |C| norm folds instead of |Q|x|C|, ~1/3 the fold work on
    # the O(|Q|·|C|) score frame.  Scoring itself runs on FLAT-UNPACKED
    # columns (codegen multiply-add chain, bit-identical to the fold —
    # see _flat_dot); the fold path remains as the dim-unknown fallback.
    # The corpus side fans out off an under-split scan so the |Q|x|C|
    # score projection parallelizes (row-local doubles; no-op at scale).
    # Dim peek runs BEFORE the fan (r15, advisor item): peeking the
    # already-fanned frame executed the repartition's shuffle-map stage
    # just to read one row.
    dim = _vec_dim(corpus, vec_col)
    corpus = fan_out_scan(corpus, id_col)
    if dim > 0:
        q = F.broadcast(
            queries.select(
                F.col(id_col).alias(query_id),
                *_flat_cols(F.col(vec_col), "q", dim),
                norm(F.col(vec_col)).alias("__qn__"),
            )
        )
        corpus = corpus.select(
            F.col(id_col),
            *_flat_cols(F.col(vec_col), "c", dim),
            norm(F.col(vec_col)).alias("__cn__"),
        )
        s = _flat_dot("q", "c", dim) / (F.col("__qn__") * F.col("__cn__"))
    else:
        q = F.broadcast(
            queries.select(
                F.col(id_col).alias(query_id),
                F.col(vec_col).alias("__qv__"),
                norm(F.col(vec_col)).alias("__qn__"),
            )
        )
        corpus = corpus.withColumn("__cn__", norm(F.col(vec_col)))
        s = dot(F.col("__qv__"), F.col(vec_col)) / (
            F.col("__qn__") * F.col("__cn__")
        )
    if round_dp is not None:
        s = F.round(s, round_dp)
    scored = corpus.join(q, F.col(query_id) != F.col(id_col)).select(
        query_id,
        F.col(id_col).alias("neighbor_id"),
        s.alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def cosine_pairs(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (left_id, right_id) pairs with cosine >= threshold, left broadcast.

    Norms hoisted per side (one fold per row, not three per pair) —
    bit-identical scores, see embedding_near_dups."""
    l = F.broadcast(
        left.select(
            F.col(id_col).alias("left_id"),
            F.col(vec_col).alias("__lv__"),
            norm(F.col(vec_col)).alias("__ln__"),
        )
    )
    out = (
        right.withColumn("__rn__", norm(F.col(vec_col)))
        .join(l, F.col("left_id") < F.col(id_col))
        .select(
            "left_id",
            F.col(id_col).alias("right_id"),
            (dot(F.col("__lv__"), F.col(vec_col))
             / (F.col("__ln__") * F.col("__rn__"))).alias("score"),
        )
    )
    return out.filter(F.col("score") >= threshold)


def hyperplane_bucket(
    vec: Column, n_planes: int = 12, plane_offset: int = 0
) -> Column:
    """Random-hyperplane LSH bucket id for cosine ANN at scale.

    Deterministic pseudo-hyperplanes: component i of plane p weighs ±1
    from the arithmetic mix in porthash.plane_sign (no string hashing, and
    recomputable in any SQL engine — the driver's DuckDB oracle re-derives
    the buckets); bucket = sign bits packed to an int.  Collisions
    preserve cosine locality; search only within a bucket (and optionally
    neighboring buckets by flipping one bit).  ``plane_offset`` selects a
    disjoint slice of the plane family — table t of a multi-table LSH
    index uses planes [t*n_planes, (t+1)*n_planes).
    """
    from financial_data_science_spark.functions.porthash import plane_sign_col

    # ONE pass over the vector computing every plane's projection into an
    # array accumulator (vs one aggregate-fold walk per plane): measured
    # 35% faster at 9 planes x 25k vectors, bit-identical buckets
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    pairs = F.zip_with(
        vec, idx, lambda v, i: F.struct(v.cast("double").alias("v"), i.alias("i"))
    )
    projs = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0.0), n_planes),
        lambda acc, x: F.transform(
            acc,
            lambda e, p: e
            + x["v"] * plane_sign_col(p + F.lit(plane_offset), x["i"]),
        ),
    )
    return F.aggregate(
        projs,
        F.lit(0).cast("long"),
        lambda acc, pr: acc * 2 + F.when(pr >= 0, 1).otherwise(0),
    )


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 3,
    threshold: float = 0.4,
    materialize: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at corpus scale: multi-table
    hyperplane-LSH blocking, then exact cosine only on bucket-collision
    candidates (the embedding-space sibling of MinHash near-dup dedup).

    Each of the ``n_tables`` independent tables hashes with its own
    disjoint slice of the plane family; a pair is a candidate if it
    collides in ANY table (recall grows with tables, the standard
    OR-amplification).  Physical shape: per-table self equi-join on the
    bucket id (shuffle = rows x tables, linear), distinct on the pair
    key, then one join back to fetch vectors for the exact score —
    never an all-pairs product.  At 100 TB tune n_planes up (smaller
    buckets) and n_tables for the recall target.

    ``materialize`` (default True) eagerly localCheckpoints the tiny
    (id, bucket...) projection so the 2 x n_tables join sides read it
    instead of re-deriving the plane folds (measured 9.1s -> 5.8s at
    sf0.1).  Block lifecycle: checkpoint blocks are freed by Spark's
    ContextCleaner once the returned DataFrame (and its lineage) is no
    longer referenced — repeated library calls in one long session pin
    storage only for results the caller is still holding.  Pass
    ``materialize=False`` on storage-tight clusters or when composing
    into a plan the caller will persist wholesale."""
    from financial_data_science_spark.operators.layout import fan_out_scan

    # r15 RE-SHAPE of the r14 fan-out, from an interleaved quiet-window
    # A/B at sf0.1 (driver regression root-cause, verdict item 2): this
    # kernel's heavy row-local work — the hyperplane folds — runs at
    # BUILD time into the eager bucket checkpoint, so fanning the whole
    # frame only inflated the TIMED region (six 32-partition checkpoint
    # scans + two fan exchanges under the lv/rv unpack) with task
    # overhead: timed 0.92s fanned vs 0.31s unfanned (production twin),
    # 1.17s vs 0.83s (catalog entry).  So: fan ONLY the bucket-fold
    # lineage (parallel build, untimed locally / real work at scale),
    # COMPACT the tiny (id, ints) bucket frame before checkpointing it
    # (guide §6: small reused intermediates should be few partitions —
    # the repartition is build-time and carries 3 ints/row), and leave
    # the lv/rv fetch projections on the raw scan (their unpack is
    # light; pair-score parallelism comes from the join shuffle, which
    # AQE sizes).  Dim peek BEFORE the fan (r15, advisor item).
    dim = _vec_dim(emb, vec_col)
    emb_fold = fan_out_scan(emb, id_col)
    ids = F.col(id_col)
    # Compute every table's bucket ONCE and materialize the tiny
    # (id, b0..b{t-1}) frame — 3 ints per row — so the per-table
    # self-joins scan cached buckets instead of re-deriving the plane
    # folds on BOTH sides of every join (6 recomputes for 3 tables):
    # measured 9.1s -> 5.8s at sf0.1 (r7).  On a cluster the equivalent
    # is a persisted bucket projection.  This supersedes the earlier
    # per-table-branch fold-pruning argument (r5 note): with the folds
    # computed once there is nothing left to prune.  The single-join
    # explode variant (3x fewer exchanges) stays a measured
    # anti-optimization (SCALE.md).  Vectors are NOT carried into the
    # checkpoint; the exact-score stage re-fetches them from the source
    # so the materialized state stays minimal.
    b = emb_fold.select(
        ids,
        *[
            hyperplane_bucket(
                F.col(vec_col), n_planes, plane_offset=t * n_planes
            ).alias(f"__b{t}__")
            for t in range(n_tables)
        ],
    )
    if materialize:
        from financial_data_science_spark.operators.layout import (
            compact_width,
        )

        # compact the checkpoint so the 2 x n_tables timed re-scans read
        # a few right-sized blocks instead of one block per fold task
        # (identity when the frame is already compact or size-unknown)
        w = compact_width(b)
        if w:
            b = b.repartition(w, ids)
        b = b.localCheckpoint(eager=True)
    cands = None
    for t in range(n_tables):
        lhs = b.select(ids.alias("left_id"), F.col(f"__b{t}__").alias("__bk__"))
        rhs = b.select(ids.alias("right_id"), F.col(f"__b{t}__").alias("__bk__"))
        c = (
            lhs.join(rhs, "__bk__")
            .filter(F.col("left_id") < F.col("right_id"))
            .select("left_id", "right_id")
        )
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    # Per-VECTOR norms, not per-pair: cosine(l, r) re-derives sqrt(l.l)
    # and sqrt(r.r) for every candidate pair — three 0(dims) folds per
    # pair where one suffices.  Hoisting the norm into the fetch
    # projections computes it once per vector (rows folds, not 3x pairs
    # folds) and is BIT-IDENTICAL: the self-dot fold is the same
    # expression over the same array (same double), and sqrt / * / /
    # are correctly rounded, so dot/(sqrt(dl)*sqrt(dr)) ==
    # dot/(nl*nr) exactly — oracle parity untouched (measured 7.7s ->
    # 3.8s warm on the sf0.1 catalog entry, ~375k candidate pairs,
    # identical 340 output rows, hash-strict green).
    # FLAT-COLUMN exact scoring (r14): the array-fold dot product is a
    # higher-order function, hence CodegenFallback — every candidate
    # pair pays an INTERPRETED 64-element fold (measured 2.6s of the
    # entry's 3.0s at sf0.1, ~356k pairs).  Unpacking the vector into
    # ``dim`` double columns at the two fetch projections turns the
    # score into a flat left-to-right multiply-add chain that whole-
    # stage codegen compiles: ((0.0 + l0*r0) + l1*r1) + ... is the SAME
    # IEEE addition sequence as the fold (acc = acc + l_i*r_i from 0.0),
    # so every score double is bit-identical — verified row-for-row at
    # sf0.1 (340 rows equal) and strict-hash green.  Null/ragged arrays
    # keep their semantics: a missing element yields a null product and
    # nulls the whole sum, exactly as the zip_with fold does.  The dim
    # comes from ONE first() row at plan-build time (a bounded driver
    # peek, same class as the centroid/meta collects elsewhere in this
    # module); an empty frame falls back to the fold formulation.
    # Measured 1.87s -> 0.97s warm on the scored pipeline.  (r15: the
    # dim peek moved above the fan call; the hoisted norms STAY as the
    # interpreted fold — swapping them for flat self-dot chains was
    # measured SLOWER here, the per-stage plan-bloat cost again.)
    if dim > 0:
        vec = F.col(vec_col)
        lv = emb.select(
            ids.alias("left_id"),
            *[vec.getItem(i).cast("double").alias(f"__l{i}__") for i in range(dim)],
            norm(vec).alias("__ln__"),
        )
        rv = emb.select(
            ids.alias("right_id"),
            *[vec.getItem(i).cast("double").alias(f"__r{i}__") for i in range(dim)],
            norm(vec).alias("__rn__"),
        )
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + F.col(f"__l{i}__") * F.col(f"__r{i}__")
        score = acc / (F.col("__ln__") * F.col("__rn__"))
    else:
        lv = emb.select(
            ids.alias("left_id"),
            F.col(vec_col).alias("__lv__"),
            norm(F.col(vec_col)).alias("__ln__"),
        )
        rv = emb.select(
            ids.alias("right_id"),
            F.col(vec_col).alias("__rv__"),
            norm(F.col(vec_col)).alias("__rn__"),
        )
        score = dot(F.col("__lv__"), F.col("__rv__")) / (
            F.col("__ln__") * F.col("__rn__")
        )
    scored = cands.join(lv, "left_id").join(rv, "right_id").select(
        "left_id",
        "right_id",
        # rounded BEFORE the threshold compare (round-before-compare
        # discipline: a cross-engine ulp at the boundary cannot flip
        # pair membership against an oracle)
        F.round(score, 6).alias("score"),
    )
    return scored.filter(F.col("score") >= threshold)


# ---------------------------------------------------------------- minhash

def minhash_band_keys(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Per-row LSH band keys as pure STATELESS projections — the
    streaming-safe MinHash formulation.

    The batch path (:func:`minhash_signatures`) computes each minhash as
    a ``min()`` hash AGGREGATE over exploded shingles — optimal for a
    standing corpus but an aggregation, which Structured Streaming
    append mode cannot run per-doc without event-time grouping.  Here
    the whole signature folds inside one row: base-hash the distinct
    shingle array once (``transform``), then each of the ``num_hashes``
    affine min-hashes is an ``array_min`` over that cached array, and
    each band key is the same 2-row fold used by the banded bucket
    join.  Same coefficients (``random.Random(seed)``), same portable
    31-bit arithmetic, so values are identical to the batch/oracle
    pipeline — proven by parity test.

    Output: one row per (doc, band): ``id_col, band (int), bhash``.
    Docs with no shingles are dropped (no dedup identity — same rule as
    the batch path).  Works on static AND streaming frames; the k-wide
    expression stays manageable because ``num_hashes`` here is the
    streaming dial (default 8), not the batch 64."""
    import random

    from financial_data_science_spark.functions.porthash import MOD, gram_hashes31
    from financial_data_science_spark.functions.text import tokens

    assert num_hashes % bands == 0 and num_hashes // bands == 2, (
        "band key fold is written for rows_per_band=2 (matches the "
        "banded bucket join and its oracle)"
    )
    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, MOD), rng.randrange(0, MOD))
              for _ in range(num_hashes)]
    # composed one-fold-per-token gram hashes (porthash.gram_hashes31);
    # its post-hash array_distinct changes nothing downstream — the
    # signature is an array_min and the emptiness filter sees distinct
    # arrays empty iff the raw gram list is
    tcol = F.col(text_col) if isinstance(text_col, str) else text_col
    base = docs.withColumn(
        "__hs__", gram_hashes31(tokens(F.lower(tcol)), shingle_k)
    ).filter(F.size("__hs__") > 0)
    def _affine(a: int, b: int):
        # bind via closure, NOT lambda defaults: Spark maps the lambda's
        # PARAMETER COUNT to the 1/2/3-arg higher-order variants
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MOD)

    sig = [
        F.array_min(F.transform(F.col("__hs__"), _affine(a, b)))
        for a, b in coeffs
    ]
    bkeys = F.array(
        *[
            ((sig[2 * b] * F.lit(65537) + sig[2 * b + 1]) % F.lit(MOD)).alias(
                f"b{b}"
            )
            for b in range(bands)
        ]
    )
    other = [c for c in docs.columns if c != text_col and c != id_col]
    return (
        base.select(id_col, *other, F.posexplode(bkeys).alias("band", "bhash"))
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
    portable: bool = False,
    max_df: float | int | None = None,
    stop_frame: DataFrame | None = None,
) -> DataFrame:
    """Per-doc MinHash signature as ``h0..h{k-1}`` columns + ``__sig__`` array.

    Physical shape: explode distinct shingles -> ONE hash aggregate with k
    ``min(xxhash64(seed_i, shingle))`` columns (map-side partial combine).
    This deliberately avoids a k-wide nested array expression per row,
    which blows up the Catalyst plan and codegen when the signature is
    re-referenced per band.

    ``portable=True`` swaps the base shingle hash from xxhash64 to the
    arithmetic polynomial in porthash (recomputable in DuckDB — used by
    the oracle-checked catalog query); xxhash64 remains the production
    default (one fused JVM hash, faster at scale).

    ``max_df`` drops STOP SHINGLES — shingles appearing in more than
    ``max_df`` docs (int = absolute count, float = fraction of the
    corpus) — before hashing.  Boilerplate n-grams (license headers,
    nav chrome) are the LSH skew trap: one ubiquitous shingle drags
    thousands of unrelated docs into shared buckets, and the bucket
    self-join fans out quadratically IN THAT BUCKET.  The stop set
    itself is tiny (only the >max_df tail), so the filter is a
    broadcast anti-join; the df census is one combinable aggregate.
    Docs whose every shingle is stopped drop out of the signature
    frame (all-boilerplate docs have no dedup identity — deliberate).

    ``stop_frame`` applies a PRE-COMPUTED stop set instead of censusing
    this frame — the frozen-census half of incremental dedup
    (:func:`stop_shingle_census` builds it from the standing corpus;
    the index persists it; each arriving batch hashes under it).  One
    column named by family (``__shingle__`` portable / ``__h64__``
    production); mutually exclusive with ``max_df``, which would
    re-census and drift the kept-shingle set.
    """
    import random

    if max_df is not None and stop_frame is not None:
        raise ValueError(
            "minhash_signatures: pass max_df (census THIS frame) or "
            "stop_frame (apply a frozen census), not both — a per-batch "
            "re-census is exactly the drift the frozen set exists to stop"
        )
    from financial_data_science_spark.operators.layout import fan_out_scan

    # under-split scans serialize the shingle explode + hash + partial
    # aggregation on one core (single-row-group parquet); fan out BY ID
    # so the repartition exchange replaces the signature aggregate's
    # exchange (min() per id is partitioning-order-independent, so the
    # signature values are unchanged).  No-op at scale / on streams.
    # The max_df census count() below peeks the PRE-fan frame (r15):
    # counting the fanned frame executed the repartition's shuffle-map
    # stage at plan-build time for a metadata-grade count.
    raw_docs = docs
    docs = fan_out_scan(docs, id_col)
    rng = random.Random(seed)
    p = (1 << 31) - 1
    coeffs = [(rng.randrange(1, p), rng.randrange(0, p)) for _ in range(num_hashes)]
    tcol = F.col(text_col) if isinstance(text_col, str) else text_col
    if portable and max_df is None and stop_frame is None:
        # composed one-fold-per-token gram hashes, no string
        # materialization at all: the signature is min-of-affine over
        # the hash values, so neither gram strings nor duplicate hash
        # values matter (porthash.gram_hashes31 docstring has the
        # distinct-order argument)
        from financial_data_science_spark.functions.porthash import gram_hashes31
        from financial_data_science_spark.functions.text import tokens

        exploded = docs.select(
            F.col(id_col),
            F.explode(gram_hashes31(tokens(F.lower(tcol)), shingle_k)).alias(
                "__h0__"
            ),
        )
        sig = exploded.groupBy(id_col).agg(
            *[
                F.min((F.col("__h0__") * F.lit(a) + F.lit(b)) % F.lit(p)).alias(
                    f"h{i}"
                )
                for i, (a, b) in enumerate(coeffs)
            ]
        )
        return sig.withColumn(
            "__sig__", F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
        )
    if portable:
        # max_df needs the gram STRING too (the stop-shingle census and
        # anti-join key) — pair each distinct gram string with its
        # composed hash in one pass (porthash.gram_structs31): same
        # distinct rows as the string-only explode, hash precomputed
        from financial_data_science_spark.functions.porthash import gram_structs31
        from financial_data_science_spark.functions.text import tokens

        exploded = docs.select(
            F.col(id_col),
            F.explode(gram_structs31(tokens(F.lower(tcol)), shingle_k)).alias(
                "__g__"
            ),
        ).select(
            id_col,
            F.col("__g__.s").alias("__shingle__"),
            F.col("__g__.h").alias("__h0pre__"),
        )
    else:
        # hash each distinct shingle ONCE and drop the string right at
        # the explode: every downstream consumer (the df census under
        # max_df AND the signature aggregate) keys on the 64-bit hash,
        # so the frame that gets checkpointed/shuffled is (id, long)
        # instead of (id, string).  Censusing document frequency on
        # xxhash64 is safe where the portable path's 31-bit hash is
        # not: a collision needs ~n^2/2^64 odds to merge two shingles'
        # counts (vs n^2/2^31 — real at corpus scale), which is why the
        # oracle path keeps its string census and this one does not.
        exploded = docs.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_k)).alias("__shingle__"),
        ).select(id_col, F.xxhash64("__shingle__").alias("__h64__"))
    base_hash = (
        F.col("__h0pre__")
        if portable
        else F.pmod(F.col("__h64__"), F.lit(p))
    )
    census_key = "__shingle__" if portable else "__h64__"
    if max_df is not None:
        # the census AND the hash aggregate both consume the exploded
        # frame — materialize it once so the tokenize+shingle+explode
        # pass isn't re-derived per consumer (measured 6.9s -> 5.0s on
        # the stop-shingle catalog query at sf0.1, r7).  Only this
        # branch double-consumes; without max_df a checkpoint would be
        # pure overhead.  At 100 TB this trades a corpus-sized
        # executor-local materialization for the second tokenize scan —
        # the standard persist tradeoff (an (id, int64) frame on the
        # production path, since the string died at the explode; the
        # string-keyed oracle path pins the wider frame); drop it on
        # storage-tight clusters by pre-filtering with an explicit stop
        # list instead.
        # Blocks are freed by the ContextCleaner once the returned
        # frame's lineage is dropped (same lifecycle note as
        # embedding_near_dups) — not session-permanent.
        exploded = exploded.localCheckpoint(eager=True)
        # shingles are per-doc distinct, so count(*) per shingle IS the
        # document frequency; sklearn-style dispatch on TYPE, not value:
        # float = fraction of the corpus (1.0 = keep everything), int =
        # absolute document count
        if isinstance(max_df, float):
            if not 0.0 < max_df <= 1.0:
                raise ValueError(
                    f"float max_df must be a fraction in (0, 1], got {max_df}; "
                    "pass an int for an absolute document count"
                )
            limit = int(max_df * raw_docs.count())
        else:
            limit = int(max_df)
        stop = (
            exploded.groupBy(census_key)
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > limit)
            .select(census_key)
        )
        exploded = exploded.join(F.broadcast(stop), census_key, "left_anti")
    elif stop_frame is not None:
        # frozen census: the stop set was computed elsewhere (the
        # standing corpus) — no census pass here, just the broadcast
        # anti-join; the caller guarantees the family matches (the
        # at-rest index meta validates it)
        exploded = exploded.join(
            F.broadcast(stop_frame.select(census_key)), census_key, "left_anti"
        )
    exploded = exploded.select(
        id_col,
        # one string hash per shingle; the k-family is affine mixes of it
        # (a_i*h+b_i mod p) — 64 multiply-adds instead of 64 string hashes
        base_hash.alias("__h0__"),
    )
    sig = exploded.groupBy(id_col).agg(
        *[
            F.min((F.col("__h0__") * F.lit(a) + F.lit(b)) % F.lit(p)).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return sig.withColumn("__sig__", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]))


def lsh_band_key(b: int, rows_per_band: int, portable: bool) -> Column:
    """Band key over ``h{i}`` signature columns — THE one definition of
    the LSH band fold (murmur3-backed ``F.hash`` in production, the
    65537-fold 31-bit arithmetic key when a SQL oracle must replay it).
    Shared by :func:`minhash_candidates` and the incremental index
    (functions/minhash_index.py), folded here at the r12 re-seal after
    one round of documented duplication behind the sealed-floor pin."""
    cols = [
        F.col(f"h{i}")
        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
    ]
    if not portable:
        return F.hash(*cols)
    acc = F.lit(0).cast("long")
    for c in cols:  # (acc*65537 + h) % p — h < p so products stay < 2^48
        acc = (acc * F.lit(65537) + c) % F.lit((1 << 31) - 1)
    return acc


def stop_shingle_census(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    max_df: float | int = 0.25,
    portable: bool = False,
) -> DataFrame:
    """The STOP-SHINGLE set of a corpus as a standalone frame — shingles
    whose document frequency exceeds ``max_df`` (float = corpus
    fraction, int = absolute count; same sklearn-style type dispatch as
    :func:`minhash_signatures`).

    One column, named by hash family: ``__shingle__`` (the gram string)
    on the portable path, ``__h64__`` (xxhash64) in production — the
    census key :func:`minhash_signatures` anti-joins on, so the frame
    feeds its ``stop_frame=`` parameter directly.

    This is the FREEZE half of the incremental-dedup census rule
    (minhash_index module docstring): a production ingest censuses the
    STANDING corpus once, persists this frame with the index, and
    applies it to every arriving batch — re-censusing per batch would
    drift the kept-shingle set and silently stale every at-rest
    signature.  One combinable count aggregate over the exploded grams;
    the result is tiny (only the >max_df tail) and broadcastable."""
    from financial_data_science_spark.functions.porthash import gram_structs31
    from financial_data_science_spark.functions.text import tokens
    from financial_data_science_spark.operators.layout import fan_out_scan

    # parallelize the gram explode off an under-split scan (count() per
    # shingle is partitioning-order-independent) — no-op at scale.
    # The max_df corpus count() peeks the PRE-fan frame (r15, same
    # argument as minhash_signatures).
    raw_docs = docs
    docs = fan_out_scan(docs, id_col)
    tcol = F.col(text_col) if isinstance(text_col, str) else text_col
    if portable:
        exploded = docs.select(
            F.col(id_col),
            F.explode(
                F.transform(
                    gram_structs31(tokens(F.lower(tcol)), shingle_k),
                    lambda g: g["s"],
                )
            ).alias("__shingle__"),
        )
        census_key = "__shingle__"
    else:
        exploded = docs.select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_k)).alias("__shingle__"),
        ).select(id_col, F.xxhash64("__shingle__").alias("__h64__"))
        census_key = "__h64__"
    if isinstance(max_df, float):
        if not 0.0 < max_df <= 1.0:
            raise ValueError(
                f"float max_df must be a fraction in (0, 1], got {max_df}; "
                "pass an int for an absolute document count"
            )
        limit = int(max_df * raw_docs.count())
    else:
        limit = int(max_df)
    return (
        exploded.groupBy(census_key)
        .agg(F.count(F.lit(1)).alias("__df__"))
        .filter(F.col("__df__") > limit)
        .select(census_key)
    )


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    portable: bool = False,
    max_df: float | int | None = None,
    stop_frame: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on (band, hash).

    rows/bands = num_hashes/bands hashes per band; a pair is a candidate if
    any band hashes equal.  Scale shape: explode bands (b rows per doc),
    shuffle on the band hash, self-join within buckets — no cross join.
    Returns distinct (left_id, right_id) candidates with estimated
    signature similarity.

    ``portable=True``: arithmetic shingle hash + arithmetic band key
    (instead of xxhash64 + murmur3) so a SQL oracle can recompute the
    exact candidate set; production default stays on the JVM hashes.
    ``max_df`` / ``stop_frame`` forward to :func:`minhash_signatures`
    (census here vs apply a frozen census).
    """
    rows_per_band = num_hashes // bands

    def band_key(b: int):
        return lsh_band_key(b, rows_per_band, portable)

    sig = minhash_signatures(
        docs, id_col, text_col, shingle_k, num_hashes, seed, portable=portable,
        max_df=max_df, stop_frame=stop_frame,
    )
    # Bucket join on BARE (id, band, bhash) rows, THEN attach signatures
    # by id to the deduped pairs (r14).  The previous shape hauled the
    # k-long __sig__ array through BOTH sides of the band join — at
    # k=64/bands=32 that is a 520-byte array on every one of the
    # bands x docs rows (an ~88 MB broadcast build at sf0.1) and a
    # per-COLLISION zip_with, where one per distinct pair suffices
    # (est_jaccard is a function of the two signatures only, so every
    # collision row of a pair carries the same value — dedup-then-score
    # is value-identical).  The signature aggregate is referenced three
    # times (banded + both attach sides) but its doc_id exchange is
    # computed ONCE at runtime (AQE stage reuse; ReusedExchange
    # verified in the executed plan).  Measured 1.59s -> 1.40s warm on
    # the sf0.1 production entry, output frame equal row-for-row.
    banded = sig.select(
        F.col(id_col).alias("__id__"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(b).alias("bhash"))
                    for b in range(bands)
                ]
            )
        ).alias("__band__"),
    ).select("__id__", "__band__.band", "__band__.bhash")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bhash"])
        .filter(F.col("l.__id__") < F.col("r.__id__"))
        .select(
            F.col("l.__id__").alias("left_id"),
            F.col("r.__id__").alias("right_id"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )
    ls = sig.select(F.col(id_col).alias("left_id"), F.col("__sig__").alias("__lsig__"))
    rs = sig.select(F.col(id_col).alias("right_id"), F.col("__sig__").alias("__rsig__"))
    matched = F.size(
        F.filter(
            F.zip_with(F.col("__lsig__"), F.col("__rsig__"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    return (
        pairs.join(ls, "left_id")
        .join(rs, "right_id")
        .select(
            "left_id",
            "right_id",
            (matched / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )


def band_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    max_df: float | int | None = None,
) -> DataFrame:
    """Bare LSH candidate pairs — band bucket join WITHOUT carrying the
    signature array through the shuffle.

    When every candidate is exactly verified downstream (jaccard_pairs),
    the per-pair ``est_jaccard`` prefilter doesn't pay for itself: hauling
    the k-long signature array through both sides of the bucket join and
    zipping it per joined row costs more than exact-verifying the extra
    candidates (measured ~2x on the warm path).  Self-join on one banded
    plan also lets Spark reuse the shuffle exchange for both sides.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        docs, id_col, text_col, shingle_k, num_hashes, seed, max_df=max_df
    )
    banded = sig.select(
        F.col(id_col).alias("__id__"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(
                            *[
                                F.col(f"h{i}")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ]
                        ).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band__"),
    ).select("__id__", "__band__.band", "__band__.bhash")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), ["band", "bhash"])
        .filter(F.col("l.__id__") < F.col("r.__id__"))
        .select(
            F.col("l.__id__").alias("left_id"),
            F.col("r.__id__").alias("right_id"),
        )
    )
    return pairs.dropDuplicates(["left_id", "right_id"])


# ---------------------------------------------------------------- simhash

def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Per-doc SimHash fingerprint (``simhash`` long column).

    Per token: xxhash64; per bit: +1 if set else -1, summed over tokens;
    fingerprint bit = sign of the vote.  Physical shape: explode tokens ->
    one hash aggregate with ``bits`` vote sums -> bit-pack — all JVM-side,
    map-side combinable, no wide nested expressions per row.

    ``portable=True``: 62-bit arithmetic token hash (porthash.tokhash62)
    instead of xxhash64, recomputable in the driver's DuckDB oracle; pass
    ``bits=62`` with it so votes cover exactly the hash width.
    """
    from financial_data_science_spark.functions.porthash import tokhash62
    from financial_data_science_spark.functions.text import tokens
    from financial_data_science_spark.operators.layout import fan_out_scan

    # parallelize the token explode + vote partial-aggregation off an
    # under-split scan (integer vote sums are partitioning-order-
    # independent; fingerprints unchanged) — no-op at scale / on streams
    docs = fan_out_scan(docs, id_col)
    toks = tokens(F.lower(F.col(text_col)))
    tok_hash = (
        tokhash62(F.col("__tok__")) if portable else F.xxhash64("__tok__")
    )
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("__tok__")).select(
        F.col(id_col), tok_hash.alias("__h__")
    )
    votes = exploded.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("__h__", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select(F.col(id_col), fp.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------- jaccard

def jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    strategy: str = "lsh",
    max_df: float | int | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs: candidate generation + exact verify.

    ``max_df`` (lsh strategy only) drops boilerplate stop shingles from
    CANDIDATE GENERATION (see minhash_signatures) — verification still
    scores the full shingle arrays, so reported jaccard stays exact; the
    filter only prunes which pairs get considered.

    ``strategy='lsh'`` (default, scale path): MinHash-LSH candidates tuned
    for high recall at the threshold (r=2 rows/band, b=32 bands: collision
    probability 1-(1-j^2)^32 = 0.9999 at j=0.5), then a cheap signature
    estimate pre-filter, then EXACT Jaccard verification on the full
    shingle arrays — only surviving pairs pay the array_intersect.  The
    reported jaccard is exact; completeness is bounded by LSH recall
    (>=99.99% at the threshold).

    ``strategy='prefix'``: fully exact prefix filtering (below).  Right
    choice when text is natural (frequency-skewed shingles); on adversarial
    flat-frequency corpora its candidate set degenerates.
    """
    if strategy == "lsh":
        # NOTE (measured, sf0.1): the shingling lineage runs 3x here (sig +
        # both verify sides) and that is the FASTER shape — materializing
        # the shingle arrays once via localCheckpoint and sharing them was
        # ~10% slower warm (eager barrier + 30MB write/read beats three
        # codegen-fused recomputes).  Don't "deduplicate" this work.
        from financial_data_science_spark.operators.layout import fan_out_scan

        cand = band_candidates(
            docs, id_col, text_col, shingle_k=k, num_hashes=64, bands=32,
            max_df=max_df,
        )
        # fan the verify-side shingle build off an under-split scan
        # (shingle arrays are row-local; no-op at scale)
        sh = (
            fan_out_scan(docs, id_col)
            .select(F.col(id_col), word_shingles(text_col, k).alias("__sh__"))
            .withColumn("__n__", F.size("__sh__"))
            .filter(F.col("__n__") > 0)
        )
        la = sh.select(F.col(id_col).alias("left_id"), F.col("__sh__").alias("__la__"),
                       F.col("__n__").alias("__nl__"))
        ra = sh.select(F.col(id_col).alias("right_id"), F.col("__sh__").alias("__ra__"),
                       F.col("__n__").alias("__nr__"))
        verified = (
            cand.select("left_id", "right_id")
            .join(la, "left_id")
            .join(ra, "right_id")
            .withColumn("__common__", F.size(F.array_intersect("__la__", "__ra__")))
            .withColumn(
                "jaccard",
                F.col("__common__")
                / (F.col("__nl__") + F.col("__nr__") - F.col("__common__")),
            )
        )
        return verified.filter(F.col("jaccard") >= threshold).select(
            "left_id", "right_id", "jaccard"
        )
    return _jaccard_pairs_prefix(docs, id_col, text_col, k, threshold)


def _jaccard_pairs_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via prefix filtering (PPJoin-lite).

    A naive shingle inverted-index self-join degenerates toward all-pairs
    when shingles repeat across documents (measured 227s on 5k synthetic
    docs).  Prefix filtering keeps it exact while pruning: under a global
    shingle order (ascending document frequency — rarest first), a pair
    with J >= t MUST share a shingle inside each side's prefix of the
    first ``n - ceil(t*n) + 1`` shingles.  Candidates come from joining
    prefixes only (rare shingles => tiny buckets); exact Jaccard is then
    verified on the full shingle arrays via ``array_intersect``.

    Shuffles: explode+count (df), explode+join (candidates), two id joins
    (verify) — all equi-joins on keys that stay balanced at scale.
    """
    sh = (
        docs.select(F.col(id_col), word_shingles(text_col, k).alias("__sh__"))
        .withColumn("__n__", F.size("__sh__"))
        .filter(F.col("__n__") > 0)
    )
    ex = sh.select(id_col, F.explode("__sh__").alias("shingle"))
    dfreq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df__"))
    ordered = (
        ex.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__df__"), F.col("shingle")))
            ).alias("__ord__")
        )
        .withColumn("__n__", F.size("__ord__"))
    )
    prefix_len = (
        F.col("__n__") - F.ceil(F.lit(threshold) * F.col("__n__")).cast("int") + 1
    )
    prefixes = ordered.select(
        F.col(id_col),
        F.col("__n__"),
        F.explode(
            F.transform(
                F.slice("__ord__", F.lit(1), prefix_len), lambda s: s["shingle"]
            )
        ).alias("shingle"),
    )
    l = prefixes.select(
        F.col(id_col).alias("left_id"), F.col("__n__").alias("__nl__"), "shingle"
    )
    r = prefixes.select(
        F.col(id_col).alias("right_id"), F.col("__n__").alias("__nr__"), "shingle"
    )
    cand = (
        l.join(r, "shingle")
        .filter(
            (F.col("left_id") < F.col("right_id"))
            # length filter: J >= t impossible if sizes differ too much
            & (F.col("__nl__") >= F.lit(threshold) * F.col("__nr__"))
            & (F.col("__nr__") >= F.lit(threshold) * F.col("__nl__"))
        )
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )
    la = sh.select(F.col(id_col).alias("left_id"), F.col("__sh__").alias("__la__"),
                   F.col("__n__").alias("__nl__"))
    ra = sh.select(F.col(id_col).alias("right_id"), F.col("__sh__").alias("__ra__"),
                   F.col("__n__").alias("__nr__"))
    verified = (
        cand.join(la, "left_id")
        .join(ra, "right_id")
        .withColumn("__common__", F.size(F.array_intersect("__la__", "__ra__")))
        .withColumn(
            "jaccard",
            F.col("__common__")
            / (F.col("__nl__") + F.col("__nr__") - F.col("__common__")),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold).select(
        "left_id", "right_id", "jaccard"
    )


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup on normalized text: keep the min-id row per text group."""
    key = F.lower(F.trim(F.col(text_col)))
    return (
        docs.withColumn("__key__", key)
        .groupBy("__key__")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .drop("__key__")
    )


# ---------------------------------------------------------------- IVF ANN

def _fold_norm(cv) -> float:
    """L2 norm via the same left-to-right IEEE-double fold as the JVM-side
    ``norm`` aggregate — bit-identical, so it can be precomputed once on
    the driver and inlined as a literal."""
    import math

    acc = 0.0
    for x in cv:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def _centroid_literal(cent_rows: list) -> Column:
    """``array<struct<cluster,cv,cnorm>>`` literal built from collected
    centroid rows — the broadcast-to-every-task form of the nlist-row
    centroid table.  nlist x dim doubles, a few KB: cheaper to inline than
    to broadcast-join.  The centroid norm rides along as a literal so the
    per-row cosine is one dot product, not three folds.

    (An unrolled multiply-add formulation was tried and measured 5x
    SLOWER: a dim x nlist flat Add chain explodes the expression tree and
    defeats codegen — the HOF fold over one array literal is the fast
    shape here.)

    Built as ONE ``F.expr`` SQL string, not nested ``F.lit`` calls: the
    lit/struct/array form costs nlist x (dim + 2) Py4J round trips
    (~0.9s of pure driver time per call at 8x64, and the literal is
    rebuilt every Lloyd sweep), while parsing one ~20 KB string is a
    single gateway call.  Python ``repr`` doubles round-trip exactly
    through the SQL parser (checked in test_similarity), so the plan is
    bit-identical to the lit-built tree."""

    def d(x: float) -> str:
        # repr() is shortest-roundtrip; CAST guards exotic spellings
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    parts = []
    for c, cv in cent_rows:
        arr = ",".join(d(x) for x in cv)
        parts.append(
            f"named_struct('cluster',{int(c)},'cv',array({arr}),"
            f"'cnorm',{d(_fold_norm(cv))})"
        )
    return F.expr("array(" + ",".join(parts) + ")")


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _assign_clusters(
    df: DataFrame,
    vec_col: str,
    cent_rows: list,
    round_dp: int = 6,
    metric: str = "cosine",
) -> DataFrame:
    """Map-side nearest-centroid argmax against the centroid literal: one
    projection, zero Exchange — replaces the crossJoin + per-id
    ``row_number`` argmax (a |C| x nlist-row shuffle per sweep).  Scores
    are rounded to ``round_dp`` before the max and ties break to the
    lowest cluster id (struct-max on ``(s, -cluster)``), identical to the
    window ordering it replaces.  ``metric='cosine'`` scores
    ``dot/(|v||c|)`` with the centroid norm inlined as a literal (one dot
    product per centroid, FP-identical to ``cosine``); ``metric='l2'``
    scores ``-sqdist`` — the PQ/faiss convention — so the same
    round-then-argmax discipline serves both quantizers and the DuckDB
    oracle replays either.

    The row norm is LET-BOUND (r15): the whole argmax is a higher-order
    expression (CodegenFallback, no common-subexpression elimination),
    so a bare ``norm(v)`` referenced inside the per-centroid lambda
    re-ran the O(dim) self-dot fold once PER CENTROID — nlist folds per
    row where one suffices.  ``porthash.let_`` evaluates it once; the
    bound double is the identical value, so scores are bit-identical."""
    from financial_data_science_spark.functions.porthash import let_

    v = F.col(vec_col)

    def _argmax(score):
        return F.array_max(
            F.transform(
                _centroid_literal(cent_rows),
                lambda c: F.struct(
                    score(c).alias("s"),
                    (-c["cluster"]).alias("negc"),
                    c["cluster"].alias("cluster"),
                ),
            )
        )

    if metric == "cosine":
        best = let_(
            norm(v),
            lambda nv: _argmax(
                lambda c: F.round(dot(v, c["cv"]) / (nv * c["cnorm"]), round_dp)
            ),
        )
    elif metric == "l2":
        best = _argmax(lambda c: -F.round(sqdist(v, c["cv"]), round_dp))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return df.withColumn("cluster", best["cluster"])


def _ivf_train_rows(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    iters: int = 3,
    round_dp: int = 6,
    train_mod: int = 1,
    metric: str = "cosine",
) -> list:
    """Lloyd training loop returning the centroids as collected rows
    ``[(cluster, cv), ...]`` — the form the map-side assignment literal
    wants.  Each sweep: map-side argmax assignment (no shuffle), then one
    posexplode + two-level aggregation (dim x nlist partial cells,
    map-side combinable) for the coordinate means.  Only the nlist-row
    centroid frame is ever collected.

    ``train_mod > 1`` trains the quantizer on the deterministic 1-in-mod
    id subset (``id % mod == 0``) — the standard IVF recipe (a coarse
    quantizer never needs the full corpus; at 100 TB you train on a
    sample and assign everything).  The rule is replayable SQL, so the
    oracle trains on exactly the same subset.  The sample is
    localCheckpointed once: the sweeps iterate over in-memory blocks, not
    repeated source scans."""
    v = F.col(vec_col)
    train = corpus.select(id_col, vec_col)
    if train_mod > 1:
        train = train.filter((F.col(id_col) % train_mod) == 0)
    train = train.localCheckpoint(eager=True)
    init = (
        train.orderBy(id_col)
        .limit(nlist)
        .select(
            # bounded by construction: nlist rows after the limit
            F.row_number()
            .over(Window.partitionBy(F.lit(0)).orderBy(id_col))
            .alias("cluster"),
            F.transform(v, lambda x: F.round(x.cast("double"), round_dp)).alias("cv"),
        )
    )
    cent_rows = sorted((r["cluster"], list(r["cv"])) for r in init.collect())
    for _ in range(iters):
        asg = _assign_clusters(
            train.select(vec_col), vec_col, cent_rows, round_dp, metric
        )
        cells = (
            asg.select("cluster", F.posexplode(v).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), round_dp).alias("cavg"))
        )
        rows = (
            cells.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cavg"))),
                    lambda st: st["cavg"],
                ).alias("cv")
            )
            .collect()
        )
        cent_rows = sorted((r["cluster"], list(r["cv"])) for r in rows)
    return cent_rows


def ivf_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    iters: int = 3,
    round_dp: int = 6,
    train_mod: int = 1,
) -> DataFrame:
    """Deterministic coarse quantizer for IVF: Lloyd's iterations with
    cosine assignment.

    Init = the ``nlist`` lowest-id corpus vectors; each sweep assigns every
    vector to its max-cosine centroid (ties to the lowest cluster id) and
    re-estimates centroids as the coordinate mean of members, rounded to
    ``round_dp`` so the floating sums (whose accumulation order is
    engine/partitioning-dependent) snap to a reproducible grid — the same
    determinism discipline as the breakpoint operators.  Assignment scores
    are rounded likewise before the argmax.  Fixed iteration count, no RNG:
    the DuckDB oracle replays the training bit-for-bit.

    Scale shape: assignment is a map-side argmax against an inlined
    centroid literal (zero Exchange); the update is one posexplode +
    two-level aggregation.  Nothing is driver-side but the loop control
    and the nlist-row centroid collect between sweeps.
    """
    cent_rows = _ivf_train_rows(
        corpus, id_col, vec_col, nlist, iters, round_dp, train_mod
    )
    return corpus.sparkSession.createDataFrame(
        [(c, list(cv)) for c, cv in cent_rows], "cluster int, cv array<double>"
    )


def _probe_clusters(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cent_rows: list,
    nprobe: int,
    query_id: str,
    keep: tuple = (),
) -> DataFrame:
    """Top-``nprobe`` coarse clusters per query, map-side: sort the
    scored centroid array ascending on (-s, cluster) — s desc, ties to
    lowest cluster, same ordering as the row_number it replaces — slice
    nprobe, explode.  Shared by the IVF and IVF+PQ query paths.
    ``keep`` carries extra query-side columns (e.g. a label for filtered
    search) through unchanged."""
    from financial_data_science_spark.functions.porthash import let_

    qv = F.col("__qv__")
    # query norm let-bound (r15): interpreted HOFs have no CSE, so a
    # bare norm(qv) in the per-centroid lambda re-ran the O(dim) fold
    # nlist times per query row; bound once, values bit-identical
    probe_arr = let_(
        norm(qv),
        lambda nq: F.transform(
            _centroid_literal(cent_rows),
            lambda c: F.struct(
                (-F.round(dot(qv, c["cv"]) / (nq * c["cnorm"]), 6)).alias("negs"),
                c["cluster"].alias("cluster"),
            ),
        ),
    )
    return (
        queries.select(
            F.col(id_col).alias(query_id), F.col(vec_col).alias("__qv__"), *keep
        )
        .withColumn(
            "cluster",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(probe_arr), 1, nprobe),
                    lambda s: s["cluster"],
                )
            ),
        )
        .select(query_id, "__qv__", "cluster", *keep)
    )


def ivf_build_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    iters: int = 3,
    train_mod: int = 1,
    persist: bool = False,
    payload: tuple = (),
    fan_out: bool = True,
) -> dict:
    """TRAIN-ONCE half of IVF (the faiss ``index.train()`` +
    ``index.add()`` split): Lloyd the coarse quantizer, bin the corpus,
    and return ``{"centroids": rows, "binned": DataFrame}``.

    ``persist=True`` materializes the binned corpus with an eager
    localCheckpoint — the 'index on disk' stance: at query time only the
    probed lists are scanned and NO training/binning work re-runs.  On a
    cluster the equivalent is writing ``binned`` bucketed by cluster.

    ``payload`` names extra corpus columns stored in the inverted lists
    (same vector-DB payload pattern as :func:`ivfpq_build_index`) so
    filtered search (``ivf_query_index(candidate_filter=...)``) can
    prune candidates BEFORE the top-k window.  Unlike the PQ index the
    in-list vectors are FULL PRECISION, so filtered IVF is the right
    twin for boundary-sensitive retrieval (e.g. hard-negative mining,
    where PQ's quantization error drowns the fine different-label
    ranking — measured in SCALE.md)."""
    from financial_data_science_spark.operators.layout import fan_out_scan

    cent_rows = _ivf_train_rows(
        corpus, id_col, vec_col, nlist, iters, train_mod=train_mod
    )
    # fan ONLY the assignment input (row-local argmax — partitioning-
    # independent); the training lineage above keeps its partitioning
    # (its float avg aggregates are accumulation-order-sensitive).
    # ``fan_out=False`` (semdedup's cell-split path) keeps the binned
    # frame's original partitioning too: downstream sub-kmeans sweeps
    # aggregate float avgs over it, and fanning would make their
    # partial-merge order fetch-nondeterministic.
    assign_in = corpus.select(id_col, vec_col, *payload)
    if fan_out:
        assign_in = fan_out_scan(assign_in, id_col)
    binned = _assign_clusters(assign_in, vec_col, cent_rows, 6)
    if persist:
        binned = binned.localCheckpoint(eager=True)
    return {"centroids": cent_rows, "binned": binned,
            "id_col": id_col, "vec_col": vec_col, "payload": tuple(payload)}


def ivf_query_index(
    queries: DataFrame,
    index: dict,
    k: int = 5,
    nprobe: int = 2,
    query_id: str = "query_id",
    qkeep: tuple = (),
    candidate_filter=None,
) -> DataFrame:
    """QUERY-ONLY half of IVF: probe ``nprobe`` lists of a pre-built
    index and return exact within-list top-k.  No Lloyd sweeps, no
    binning — the per-query cost the SCALE.md crossover argument prices.

    Filtered search mirrors :func:`ivfpq_query_index`: ``qkeep`` carries
    query-side columns into the candidate frame and ``candidate_filter``
    prunes BEFORE the top-k window (top-k means "best k satisfying the
    predicate"); referenced corpus-side columns must be in the index's
    ``payload``.  In-list scores are exact cosine, so no rerank stage is
    needed after a filtered IVF query."""
    id_col, vec_col = index["id_col"], index["vec_col"]
    cent_rows, binned = index["centroids"], index["binned"]
    v = F.col(vec_col)
    # FLAT in-list scoring (r15): the per-candidate dot/norm folds were
    # the last interpreted (CodegenFallback) scoring stage in the IVF
    # query path.  The vector dim comes from the trained centroid rows
    # — coordinate means over the corpus, so len == corpus dim — with
    # ZERO extra driver jobs (no _vec_dim peek); empty centroids fall
    # back to the fold.  The flat chains are the same IEEE sequences as
    # the folds (see _flat_dot/_flat_norm), so scores are bit-identical.
    # SIZE-GATED on the corpus side (_flat_gate): at bench scale the
    # chains' fixed plan-bloat cost exceeds the per-row savings; at
    # corpus scale the per-row savings dominate.
    dim = _flat_gate(binned, len(cent_rows[0][1]) if cent_rows else 0)
    qn = (_flat_norm(F.col("__qv__"), dim) if dim > 0
          else norm(F.col("__qv__")))
    probes = _probe_clusters(
        queries, id_col, vec_col, cent_rows, nprobe, query_id, keep=qkeep
    ).withColumn("__qn__", qn)
    # probes is |Q| x nprobe rows — broadcast it so the corpus-side bin
    # join is map-side; a hash shuffle on the nlist-value cluster key
    # would cap parallelism at nlist and skew on popular lists.
    # Norms hoisted per SIDE below the join (one fold per corpus row /
    # per probe row, evaluated before the hash-table probe fans out) —
    # bit-identical scores, see embedding_near_dups; the persisted
    # index schema is untouched (the corpus norm is a lazy projection
    # on top of the loaded/checkpointed binned frame)
    binned = binned.withColumn(
        "__cn__", _flat_norm(v, dim) if dim > 0 else norm(v)
    )
    scored = F.broadcast(probes).join(binned, "cluster").filter(
        F.col(query_id) != F.col(id_col)
    )
    if candidate_filter is not None:
        scored = scored.filter(candidate_filter)
    raw_dot = (_flat_dot_arr(F.col("__qv__"), v, dim) if dim > 0
               else dot(F.col("__qv__"), v))
    scored = scored.select(
        query_id,
        *qkeep,
        F.col(id_col).alias("neighbor_id"),
        *index.get("payload", ()),
        # rounded to the 6dp grid BEFORE the top-k ordering so a
        # cross-engine ulp difference near a rank boundary cannot flip
        # membership vs the oracle (same discipline as the assignment)
        F.round(
            raw_dot / (F.col("__qn__") * F.col("__cn__")), 6
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 2,
    iters: int = 3,
    query_id: str = "query_id",
    train_mod: int = 1,
) -> DataFrame:
    """IVF approximate nearest neighbors: train the coarse quantizer, bin
    the corpus once, probe only ``nprobe`` inverted lists per query.

    The scale path for similarity search when hyperplane-LSH recall is not
    enough: scoring cost drops from |Q| x |C| (cosine_topk) to
    |Q| x (nprobe/nlist) x |C|.  Both the corpus binning and the query
    probing are map-side argmax/top-nprobe against the inlined centroid
    literal — no Exchange anywhere before the final top-k window.  Recall
    depends on nprobe/nlist — the standard IVF tradeoff; results within
    the probed lists are exact.

    Composition of :func:`ivf_build_index` + :func:`ivf_query_index`
    (train+query fused for the one-shot/oracle path; callers with a
    standing corpus should build the index once and reuse it)."""
    index = ivf_build_index(
        corpus, id_col, vec_col, nlist=nlist, iters=iters, train_mod=train_mod
    )
    return ivf_query_index(queries, index, k=k, nprobe=nprobe, query_id=query_id)


# ---------------------------------------------------------------- PQ

def _vec_array_literal(cent_rows: list) -> Column:
    """array<array<double>> literal of centroid vectors POSITIONED by
    cluster id (1-based — ``element_at(lit, code)`` fetches a code's
    centroid).  Lloyd sweeps can empty a cluster, leaving id gaps; gap
    positions hold empty arrays so surviving ids still land at their own
    index (codes only ever reference surviving clusters, so a gap slot
    is never read).  Same single-``F.expr`` construction as
    _centroid_literal."""

    def d(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    by_id = {int(c): cv for c, cv in cent_rows}
    parts = [
        "array(" + ",".join(d(x) for x in by_id[c]) + ")"
        if c in by_id
        else "CAST(array() AS ARRAY<DOUBLE>)"
        for c in range(1, max(by_id) + 1)
    ]
    return F.expr("array(" + ",".join(parts) + ")")


def _adc_luts(qvec: str, books: list, sub: int) -> dict:
    """Per-query ADC lookup tables (faiss's dist_table): LUT j is an
    array<double> whose entry c = ||q_j - book_j[c]||^2, computed ONCE
    on the (broadcast) query/probe side.  Per candidate the ADC
    distance is then m array lookups + adds instead of m interpreted
    subvector sqdist folds — the work drops from m*sub ops per pair to
    m, paying m*k*sub once per query row (wins whenever a probe scores
    more than k candidates, i.e. always at corpus scale).
    BIT-IDENTICAL to the per-pair form: entry c is the same sqdist
    expression the old code evaluated after element_at, so the selected
    double is unchanged; gap slots of the codebook literal (emptied
    Lloyd clusters) evaluate to null and are never selected (codes only
    reference surviving clusters)."""
    def _lut(j: int, book: list) -> Column:
        # bind via closure, NOT lambda defaults: Spark maps the
        # lambda's PARAMETER COUNT to the 1/2/3-arg higher-order
        # variants (same trap documented at minhash_band_keys._affine)
        qs = F.slice(F.col(qvec), j * sub + 1, sub)
        return F.transform(
            _vec_array_literal(book), lambda cent: sqdist(qs, cent)
        )

    return {f"__lut{j}__": _lut(j, book) for j, book in enumerate(books)}


def _adc_sum(m: int) -> Column:
    """Left-associated ADC sum over the per-query LUT columns — the
    same addition chain the per-pair form built, so doubles match."""
    dist = None
    for j in range(m):
        term = F.element_at(F.col(f"__lut{j}__"), F.col("codes")[j])
        dist = term if dist is None else dist + term
    return dist


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    train_mod: int = 1,
) -> list[list]:
    """Product-quantization codebooks: the vector is split into ``m``
    contiguous subspaces of dim/m and each subspace gets its own
    deterministic L2 Lloyd codebook of ``k`` centroids (faiss IndexPQ
    training, minus the RNG: init = k lowest-id training subvectors,
    fixed sweeps, round-before-argmax — the same determinism discipline
    as the IVF coarse quantizer, so a SQL oracle replays training
    bit-for-bit).

    Returns ``[codebook_0, ..., codebook_{m-1}]``, each a list of
    (cluster, centroid) rows.  Memory math at 100 TB: a 64-dim float64
    vector is 512 bytes; its PQ code is m bytes (k<=256) — a 128x
    compression that lets the scored corpus live in RAM/cache while the
    full vectors stay in cold storage."""
    if dim % m:
        raise ValueError("dim must divide into m equal subspaces")
    sub = dim // m
    books = []
    for j in range(m):
        sliced = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("__sv__"),
        )
        books.append(
            _ivf_train_rows(
                sliced, id_col, "__sv__", nlist=k, iters=iters,
                train_mod=train_mod, metric="l2",
            )
        )
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "codes",
) -> DataFrame:
    """Encode every vector as its array of per-subspace nearest-centroid
    ids — ``m`` map-side L2 argmaxes in ONE projection, zero Exchange
    (the plan shape test_plans asserts for IVF assignment).  The codes
    column is the compressed corpus representation ADC scoring reads."""
    from financial_data_science_spark.operators.layout import fan_out_scan

    # parallelize the per-row argmax encode off an under-split scan —
    # row-local (round-before-argmax, deterministic ties), so codes are
    # partitioning-independent.  Never reached from the Lloyd training
    # loop (whose float avg aggregates must keep their partitioning).
    # No-op at scale / when the caller already fanned the frame.
    corpus = fan_out_scan(corpus, id_col)
    from financial_data_science_spark.functions.porthash import let_

    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    cols = []
    for j, book in enumerate(codebooks):
        # subvector slice let-bound (r15): the interpreted argmax has no
        # CSE, so a bare slice() in the per-centroid lambda re-copied
        # the subvector k times per row; bound once — codes identical
        sv = F.slice(F.col(vec_col), j * sub + 1, sub)
        lit = _centroid_literal(book)

        def _make_body(_lit):
            # bind via closure, NOT lambda defaults: Spark maps the
            # lambda's PARAMETER COUNT to the 1/2/3-arg HOF variants
            def body(svb):
                return F.array_max(
                    F.transform(
                        _lit,
                        lambda c: F.struct(
                            (-F.round(sqdist(svb, c["cv"]), 6)).alias("s"),
                            (-c["cluster"]).alias("negc"),
                            c["cluster"].alias("cluster"),
                        ),
                    )
                )

            return body

        best = let_(sv, _make_body(lit))
        cols.append(best["cluster"])
    return corpus.select(id_col, F.array(*cols).alias(out))


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    topk: int = 5,
    iters: int = 2,
    train_mod: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """PQ approximate nearest neighbors via asymmetric distance
    computation (ADC): approx_d2(q, x) = sum_j ||q_j - centroid_j[code_j(x)]||^2.

    Physical shape: train m codebooks (driver loop over m tiny Lloyd
    runs), encode the corpus map-side, broadcast the queries, and score
    each (query, code) pair with m subvector-to-centroid lookups against
    the inlined codebook literals — no Exchange before the final top-k
    window, and the scored corpus side carries only m small ints per
    row, not the full vector (the PQ memory win).  Ranking is ascending
    approximate L2, ties to the lowest neighbor id, distances rounded to
    the 6dp grid before ranking (round-before-argmax discipline)."""
    books = pq_train(corpus, id_col, vec_col, dim, m, k, iters, train_mod)
    sub = dim // m
    coded = pq_encode(corpus, books, id_col, vec_col)
    # ADC lookup tables built once per query on the broadcast side
    # (_adc_luts: m lookups per candidate instead of m sqdist folds)
    q = queries.select(
        F.col(id_col).alias(query_id), F.col(vec_col).alias("__qv__")
    )
    for name, col in _adc_luts("__qv__", books, sub).items():
        q = q.withColumn(name, col)
    q = F.broadcast(q)
    scored = coded.join(q, F.col(query_id) != F.col(id_col)).select(
        query_id,
        F.col(id_col).alias("neighbor_id"),
        F.round(_adc_sum(m), 6).alias("approx_d2"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .drop("rank")
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 8,
    topk: int = 5,
    iters: int = 2,
    train_mod: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF+PQ — the production large-scale ANN index shape (faiss IVFPQ
    with ``by_residual=False``): the cosine coarse quantizer restricts
    each query to ``nprobe`` inverted lists, and scoring inside the
    probed lists runs ADC over m-byte PQ codes instead of full vectors.

    Cost model at 100 TB: candidates = |C| * nprobe/nlist, each scored
    with m table lookups over data that is 100x+ smaller at rest than
    the raw vectors — the coarse step bounds WORK, the PQ step bounds
    MEMORY.  Physical shape: both quantizers train via the shared
    deterministic Lloyd machinery; binning and encoding are one
    shuffle-free projection; probes are broadcast so the list-restricted
    join is map-side; no Exchange before the final top-k window.  All
    three stages replay in the SQL oracle.

    Composition of :func:`ivfpq_build_index` + :func:`ivfpq_query_index`
    (train+encode+query fused; standing corpora should build once)."""
    index = ivfpq_build_index(
        corpus, id_col, vec_col, dim=dim, nlist=nlist, m=m, k=k,
        iters=iters, train_mod=train_mod,
    )
    return ivfpq_query_index(
        queries, index, nprobe=nprobe, topk=topk, query_id=query_id
    )


def ivfpq_build_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nlist: int = 8,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    train_mod: int = 1,
    persist: bool = False,
    payload: tuple = (),
) -> dict:
    """TRAIN-ONCE half of IVF+PQ: Lloyd the coarse quantizer, train the
    per-subspace PQ codebooks, bin + encode the corpus.  Returns
    ``{"coarse": rows, "books": codebooks, "coded": DataFrame}``.

    ``persist=True`` materializes the m-byte-per-vector coded corpus
    (localCheckpoint here; bucketed-by-cluster parquet on a cluster) so
    query time pays ONLY probe + ADC — the faiss train/add vs search
    split, which is what makes the nprobe/nlist cost model real.

    ``payload`` names extra corpus columns stored alongside the codes
    (the vector-DB payload-column pattern): filtered search
    (``ivfpq_query_index(candidate_filter=...)``) can then apply its
    predicate BEFORE the top-k window, so the candidate pool isn't
    flooded by rows the filter would discard — decisive when the
    predicate is selective against the nearest vectors, e.g. the
    label-inequality of hard-negative mining where every nearest
    neighbor is same-label by construction."""
    from financial_data_science_spark.operators.layout import fan_out_scan

    coarse = _ivf_train_rows(
        corpus, id_col, vec_col, nlist=nlist, iters=iters,
        train_mod=train_mod, metric="cosine",
    )
    books = pq_train(corpus, id_col, vec_col, dim, m, k, iters, train_mod)
    # fan ONLY the bin+encode input (row-local argmaxes); both Lloyd
    # trainings above keep their partitioning (order-sensitive avgs)
    binned = _assign_clusters(
        fan_out_scan(corpus.select(id_col, vec_col, *payload), id_col),
        vec_col, coarse, 6, "cosine"
    )
    coded = pq_encode(binned, books, id_col, vec_col).join(
        binned.select(id_col, "cluster", *payload), id_col
    )
    if persist:
        coded = coded.localCheckpoint(eager=True)
    return {"coarse": coarse, "books": books, "coded": coded,
            "id_col": id_col, "vec_col": vec_col, "dim": dim,
            "payload": tuple(payload)}


def ivfpq_query_index(
    queries: DataFrame,
    index: dict,
    nprobe: int = 2,
    topk: int = 5,
    query_id: str = "query_id",
    qkeep: tuple = (),
    candidate_filter=None,
) -> DataFrame:
    """QUERY-ONLY half of IVF+PQ: probe + ADC scoring over the pre-built
    coded corpus.  No training, no encoding — m table lookups per
    candidate inside the probed lists, then the top-k window.

    Filtered search: ``qkeep`` carries query-side columns into the
    candidate frame and ``candidate_filter`` (a boolean Column over the
    joined query+payload columns) prunes candidates BEFORE the top-k
    window — so topk means "best k rows SATISFYING the predicate", not
    "best k overall, minus whatever the filter kills".  Requires the
    referenced corpus-side columns to be in the index's ``payload``.
    Output carries query_id, qkeep, neighbor_id, payload, approx_d2."""
    id_col, vec_col = index["id_col"], index["vec_col"]
    coarse, books, coded = index["coarse"], index["books"], index["coded"]
    payload = index.get("payload", ())
    sub = index["dim"] // len(books)
    probes = _probe_clusters(
        queries, id_col, vec_col, coarse, nprobe, query_id, keep=qkeep
    )
    # ADC lookup tables built once per probe row on the broadcast side
    for name, col in _adc_luts("__qv__", books, sub).items():
        probes = probes.withColumn(name, col)
    scored = (
        F.broadcast(probes)
        .join(coded, "cluster")
        .filter(F.col(query_id) != F.col(id_col))
    )
    if candidate_filter is not None:
        scored = scored.filter(candidate_filter)
    scored = scored.select(
        query_id,
        *qkeep,
        F.col(id_col).alias("neighbor_id"),
        *payload,
        F.round(_adc_sum(len(books)), 6).alias("approx_d2"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .drop("rank")
    )


def rerank_exact(
    candidates: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    neighbor_id: str = "neighbor_id",
    k: int = 5,
    metric: str = "cosine",
) -> DataFrame:
    """Exact re-ranking of ANN candidates (the faiss IndexRefine
    pattern): any approximate stage — hyperplane LSH, IVF, PQ, IVFPQ —
    proposes (query, neighbor) pairs, and only those |Q| x R pairs pay
    for full-vector scoring.  Two joins back to the vector table plus a
    top-k window; the candidate frame is small by construction, so both
    fetches broadcast the candidate side and stream the corpus.

    ``metric='cosine'`` ranks descending exact cosine; ``'l2'`` ranks
    ascending exact squared distance.  Ties break to the lowest neighbor
    id; scores are rounded to the 6dp grid before ranking (the repo-wide
    round-before-argmax discipline), column ``score`` either way."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    # per-vector norms hoisted into the fetch projections (bit-identical
    # to per-pair cosine() — see embedding_near_dups); exact scoring on
    # FLAT-UNPACKED columns (codegen multiply-add chain, bit-identical
    # to the interpreted array fold — see _flat_dot), fold fallback when
    # the dim peek comes back empty
    dim = _vec_dim(corpus, vec_col)
    if dim > 0:
        qv = corpus.select(
            F.col(id_col).alias(query_id),
            *_flat_cols(F.col(vec_col), "q", dim),
            norm(F.col(vec_col)).alias("__qn__"),
        )
        nv = corpus.select(
            F.col(id_col).alias(neighbor_id),
            *_flat_cols(F.col(vec_col), "n", dim),
            norm(F.col(vec_col)).alias("__nn__"),
        )
        raw_cos = _flat_dot("q", "n", dim) / (F.col("__qn__") * F.col("__nn__"))
        raw_l2 = _flat_sqdist("q", "n", dim)
    else:
        qv = corpus.select(
            F.col(id_col).alias(query_id), F.col(vec_col).alias("__qv__"),
            norm(F.col(vec_col)).alias("__qn__"),
        )
        nv = corpus.select(
            F.col(id_col).alias(neighbor_id), F.col(vec_col).alias("__nv__"),
            norm(F.col(vec_col)).alias("__nn__"),
        )
        raw_cos = dot(F.col("__qv__"), F.col("__nv__")) / (
            F.col("__qn__") * F.col("__nn__")
        )
        raw_l2 = sqdist(F.col("__qv__"), F.col("__nv__"))
    # candidates are |Q| x R pairs — small by construction — so FORCE the
    # broadcast (don't rely on autoBroadcastJoinThreshold seeing through
    # the projection): the full vector table must stream, never shuffle
    paired = (
        F.broadcast(candidates.select(query_id, neighbor_id))
        .join(qv, query_id)
        .join(nv, neighbor_id)
    )
    if metric == "cosine":
        score = F.round(raw_cos, 6)
        order = F.col("score").desc()
    else:
        score = F.round(raw_l2, 6)
        order = F.col("score").asc()
    scored = paired.select(query_id, neighbor_id, score.alias("score"))
    w = Window.partitionBy(query_id).orderBy(order, F.col(neighbor_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    query_id: str = "query_id",
    neighbor_id: str = "neighbor_id",
    k: int | None = None,
) -> DataFrame:
    """Per-query recall@k of an approximate retrieval vs the exact top-k
    — THE tuning dial for the ANN ladder (faiss reports exactly this for
    nprobe/m sweeps).  ``recall = |approx ∩ exact| / |exact|`` per query,
    with the exact side as ground truth (queries the approximate stage
    missed entirely still appear, recall 0).  If ``k`` is given it
    overrides the per-query denominator (use when the exact frame may
    hold fewer than k rows for boundary queries).

    Shape: one broadcast-able join on (query, neighbor) + a groupBy on
    query — both sides are |Q| x k rows, trivially small next to the
    corpus no matter the corpus scale.  The exact frame is walked ONCE
    (r15): the old semi-join-for-hits + groupBy-for-denominator pair
    referenced it twice, and `exact` is typically the expensive
    brute-force arm — a left join against the deduped approx pairs
    flags hits and counts the denominator in the same aggregate
    (dedup keeps the semi-join's exists semantics if a caller passes
    duplicate approx pairs), recall values identical."""
    ap = (
        approx.select(query_id, neighbor_id)
        .dropDuplicates([query_id, neighbor_id])
        .withColumn("__hit__", F.lit(1))
    )
    per_q = (
        exact.select(query_id, neighbor_id)
        .join(ap, [query_id, neighbor_id], "left")
        .groupBy(query_id)
        .agg(
            F.count(F.lit(1)).alias("__n_exact__"),
            F.count("__hit__").alias("__hits__"),
        )
    )
    denom = (
        F.lit(float(k))
        if k is not None
        else F.col("__n_exact__").cast("double")
    )
    return per_q.select(
        query_id,
        (F.coalesce("__hits__", F.lit(0)) / denom).alias("recall"),
    )


def _residual(vec_col: str, coarse_rows: list) -> Column:
    """Element-wise residual v - coarse_centroid[cluster] (map-side: the
    centroid table rides as a positional literal, the subtraction of
    identical doubles is FP-exact across engines)."""
    cent = F.element_at(_vec_array_literal(coarse_rows), F.col("cluster"))
    return F.zip_with(
        F.col(vec_col), cent, lambda a, b: a.cast("double") - b
    )


def ivfpq_residual_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    nlist: int = 8,
    nprobe: int = 2,
    m: int = 4,
    k: int = 8,
    topk: int = 5,
    iters: int = 2,
    train_mod: int = 1,
    query_id: str = "query_id",
) -> DataFrame:
    """Residual IVF+PQ — faiss IVFPQ's DEFAULT (by_residual=True): PQ
    codebooks are trained on and encode the residual v - coarse_centroid,
    not the raw vector.  Residuals concentrate near zero, so the same
    code budget quantizes them far more accurately than raw vectors —
    the accuracy/memory sweet spot production indexes run.

    The cost vs by_residual=False: the query-side ADC operand is
    PER-PROBED-LIST (qr = qv - coarse_cv[cluster] differs per probe), so
    lookup tables cannot be shared across probes — here that is simply
    the residual expression evaluated per (query, probe) row, still
    map-side.  All stages (coarse training, binning, residual PQ
    training, encoding, probing, residual ADC) replay in the SQL oracle.
    """
    coarse = _ivf_train_rows(
        corpus, id_col, vec_col, nlist=nlist, iters=iters,
        train_mod=train_mod, metric="cosine",
    )
    sub = dim // m
    binned = _assign_clusters(
        corpus.select(id_col, vec_col), vec_col, coarse, 6, "cosine"
    )
    res = binned.withColumn("__rv__", _residual(vec_col, coarse))
    # PQ codebooks train on TRAINING-SAMPLE residuals — the TRAINING
    # lineage keeps the original partitioning (its Lloyd float avgs are
    # accumulation-order-sensitive)
    train = res if train_mod <= 1 else res.filter(
        (F.col(id_col) % train_mod) == 0
    )
    books = []
    for j in range(m):
        sliced = train.select(
            F.col(id_col), F.slice("__rv__", j * sub + 1, sub).alias("__sv__")
        )
        books.append(
            _ivf_train_rows(
                sliced, id_col, "__sv__", nlist=k, iters=iters,
                train_mod=1, metric="l2",
            )
        )
    # ENCODE lineage fans BEFORE the assignment (r15): pq_encode's
    # internal fan sat ABOVE the assign+residual projections, so those
    # row-local stages still ran on the single scan task; fanning the
    # raw (id, vec) input parallelizes them too.  Assignment and
    # residual are row-local (round-before-argmax, element-wise
    # subtract), so values are partitioning-independent; the training
    # lineage above is untouched.
    from financial_data_science_spark.operators.layout import fan_out_scan

    binned_enc = _assign_clusters(
        fan_out_scan(corpus.select(id_col, vec_col), id_col),
        vec_col, coarse, 6, "cosine",
    )
    res_enc = binned_enc.withColumn("__rv__", _residual(vec_col, coarse))
    coded = pq_encode(
        res_enc.select(id_col, F.col("__rv__").alias("__enc__")),
        books, id_col, "__enc__",
    ).join(binned_enc.select(id_col, "cluster"), id_col)
    # probes: top-nprobe coarse clusters per query (cosine, as in ivf);
    # query norm let-bound (r15) — same no-CSE argument as
    # _probe_clusters, values bit-identical
    from financial_data_science_spark.functions.porthash import let_

    qv = F.col("__qv__")
    probe_arr = let_(
        norm(qv),
        lambda nq: F.transform(
            _centroid_literal(coarse),
            lambda c: F.struct(
                (-F.round(dot(qv, c["cv"]) / (nq * c["cnorm"]), 6)).alias(
                    "negs"
                ),
                c["cluster"].alias("cluster"),
            ),
        ),
    )
    probes = (
        queries.select(F.col(id_col).alias(query_id), F.col(vec_col).alias("__qv__"))
        .withColumn(
            "cluster",
            F.explode(
                F.transform(
                    F.slice(F.array_sort(probe_arr), 1, nprobe),
                    lambda s: s["cluster"],
                )
            ),
        )
        .select(query_id, "__qv__", "cluster")
    )
    # query residual PER PROBED LIST, then ADC vs the coded residuals;
    # LUTs per (query, probe) row — the residual operand depends on the
    # probed cluster, so that row is exactly where the table belongs
    pr = probes.withColumn("__qr__", _residual("__qv__", coarse))
    for name, col in _adc_luts("__qr__", books, sub).items():
        pr = pr.withColumn(name, col)
    pr = F.broadcast(pr)
    scored = (
        pr.join(coded, "cluster")
        .filter(F.col(query_id) != F.col(id_col))
        .select(
            query_id,
            F.col(id_col).alias("neighbor_id"),
            F.round(_adc_sum(len(books)), 6).alias("approx_d2"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("approx_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .drop("rank")
    )


# ---------------------------------------------------------------- SQ8

def _dim_stats(corpus: DataFrame, vec_col: str, round_dp: int = 6) -> tuple:
    """Per-dimension (min, max) of the corpus, rounded to the shared
    grid — one posexplode + combinable aggregate, collected as two
    dim-length lists (the scalar-quantizer 'codebook')."""
    rows = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.round(F.min(F.col("val").cast("double")), round_dp).alias("lo"),
            F.round(F.max(F.col("val").cast("double")), round_dp).alias("hi"),
        )
        .collect()
    )
    by_pos = sorted((r["pos"], r["lo"], r["hi"]) for r in rows)
    return [lo for _, lo, _ in by_pos], [hi for _, _, hi in by_pos]


def _dlist_literal(xs: list) -> Column:
    def d(x: float) -> str:
        return f"CAST('{float(x)!r}' AS DOUBLE)"

    return F.expr("array(" + ",".join(d(x) for x in xs) + ")")


def sq8_encode(
    corpus: DataFrame,
    mins: list,
    maxs: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "codes",
) -> DataFrame:
    """8-bit scalar quantization (faiss IndexScalarQuantizer QT_8bit
    shape): code_i = round((v_i - min_i) / (max_i - min_i) * 255),
    clamped — per-dimension affine, one map-side projection.  64 float64
    dims (512 bytes) become 64 bytes; unlike PQ there is no training
    beyond the min/max census and decode is exact-per-dimension affine,
    so SQ8 is the first rung of the compression ladder (SQ8 -> PQ ->
    IVFPQ) with the gentlest recall loss.  Constant dimensions (max ==
    min) encode to 0 and decode to their min — exact."""
    from financial_data_science_spark.operators.layout import fan_out_scan

    # row-local affine quantization — parallelize off an under-split
    # scan (codes are partitioning-independent; no-op at scale)
    corpus = fan_out_scan(corpus, id_col)
    v = F.col(vec_col)
    if _flat_gate(corpus, len(mins) if mins and maxs else 0) > 0:
        # FLAT encode (r15): mins/maxs are driver-side lists, so the
        # interpreted zip_with + element_at-literal fold unrolls into an
        # array() of per-dimension affine expressions that whole-stage
        # codegen compiles.  Each element is the IDENTICAL arithmetic
        # over the identical operands (element_at of the min/max
        # literal == the literal element; the hi > lo guard is decided
        # from the same doubles), so codes are bit-identical.  Assumes
        # the repo-wide fixed-dim vector contract (see _vec_dim).
        # SIZE-GATED (_flat_gate): fold below the estimate threshold —
        # the 64-expression array is plan bloat the bench corpus never
        # amortizes; at corpus scale the per-row win dominates.
        def _enc(i: int) -> Column:
            lo_i, hi_i = float(mins[i]), float(maxs[i])
            if hi_i > lo_i:
                inner = F.round(
                    (v.getItem(i).cast("double") - F.lit(lo_i))
                    / (F.lit(hi_i) - F.lit(lo_i))
                    * 255
                ).cast("int")
            else:
                inner = F.lit(0)
            return F.least(F.lit(255), F.greatest(F.lit(0), inner))

        code = F.array(*[_enc(i) for i in range(len(mins))])
    else:
        lo, hi = _dlist_literal(mins), _dlist_literal(maxs)
        idx = F.sequence(F.lit(0), F.size(v) - 1)
        code = F.zip_with(
            v,
            idx,
            lambda x, i: F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.when(
                        F.element_at(hi, i + 1) > F.element_at(lo, i + 1),
                        F.round(
                            (x.cast("double") - F.element_at(lo, i + 1))
                            / (F.element_at(hi, i + 1) - F.element_at(lo, i + 1))
                            * 255
                        ).cast("int"),
                    ).otherwise(F.lit(0)),
                ),
            ),
        )
    return corpus.select(id_col, code.alias(out))


def sq8_dequantize(codes: Column, mins: list, maxs: list) -> Column:
    """Exact affine decode of SQ8 codes back to approximate doubles."""
    lo, hi = _dlist_literal(mins), _dlist_literal(maxs)
    idx = F.sequence(F.lit(0), F.size(codes) - 1)
    return F.zip_with(
        codes,
        idx,
        lambda c, i: F.element_at(lo, i + 1)
        + c.cast("double")
        / 255.0
        * (F.element_at(hi, i + 1) - F.element_at(lo, i + 1)),
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Top-k cosine against the SQ8-compressed corpus: full-precision
    queries broadcast, corpus rows scored through the affine decode —
    the scan reads 64-byte codes, not 512-byte vectors (the SQ8 win at
    rest), and every stage is map-side before the final top-k window."""
    mins, maxs = _dim_stats(corpus, vec_col)
    coded = sq8_encode(corpus, mins, maxs, id_col, vec_col)
    # decode AND norm hoisted below the join: the affine dequantize and
    # the self-dot run once per CORPUS ROW (projection evaluated
    # before the broadcast-hash probe fans out per query), not once per
    # (query, corpus) pair — bit-identical scores (same decode
    # expression -> same doubles; see embedding_near_dups for the norm
    # argument).
    # FLAT decode + scoring (r15): the dim is len(mins) (the per-dim
    # census), so the zip_with dequantize becomes an array() of per-dim
    # affine expressions, and the per-pair dot / per-row norms become
    # codegen multiply-add chains — every per-element expression is the
    # identical arithmetic over the identical operands (element_at of
    # the min/max literal == the literal element), so decoded doubles
    # and scores are bit-identical to the interpreted fold forms.
    # SIZE-GATED on the corpus estimate (_flat_gate, r15 measurement):
    # at bench scale the flat plan was ~3x SLOWER (fixed plan-bloat
    # cost, 2k rows); the fold forms return below the threshold.
    dim = _flat_gate(corpus, len(mins))
    deq = F.array(
        *[
            F.lit(float(mins[i]))
            + F.col("codes").getItem(i).cast("double")
            / F.lit(255.0)
            * (F.lit(float(maxs[i])) - F.lit(float(mins[i])))
            for i in range(dim)
        ]
    ) if dim > 0 else sq8_dequantize(F.col("codes"), mins, maxs)
    coded = coded.withColumn("__dv__", deq).withColumn(
        "__cn__",
        _flat_norm(F.col("__dv__"), dim) if dim > 0 else norm(F.col("__dv__")),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id),
            F.col(vec_col).alias("__qv__"),
            (_flat_norm(F.col(vec_col), dim) if dim > 0
             else norm(F.col(vec_col))).alias("__qn__"),
        )
    )
    raw_dot = (_flat_dot_arr(F.col("__qv__"), F.col("__dv__"), dim)
               if dim > 0 else dot(F.col("__qv__"), F.col("__dv__")))
    scored = coded.join(q, F.col(query_id) != F.col(id_col)).select(
        query_id,
        F.col(id_col).alias("neighbor_id"),
        F.round(
            raw_dot / (F.col("__qn__") * F.col("__cn__")),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


# ------------------------------------------------- index persistence

def save_ivfpq_index(index: dict, store, name: str) -> None:
    """Persist a trained IVF+PQ index through the named parquet Store
    (datasets.lookup.Store — S19): three tables, no pickles.

    ``{name}__coarse``   (cluster, cv)            — coarse centroids
    ``{name}__books``    (subspace, cluster, cv)  — PQ codebooks
    ``{name}__coded``    (id, codes, cluster)     — the encoded corpus

    This is the cluster deployment shape of :func:`ivfpq_build_index`'s
    ``persist=True``: train once anywhere, write the m-bytes-per-vector
    coded corpus + a few KB of centroids, and every later query session
    pays probe + ADC only.  At scale, write ``__coded`` bucketed by
    ``cluster`` so probes prune files instead of scanning."""
    spark = index["coded"].sparkSession
    coarse = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in index["coarse"]],
        "cluster int, cv array<double>",
    )
    books = spark.createDataFrame(
        [
            (j, int(c), [float(x) for x in cv])
            for j, book in enumerate(index["books"])
            for c, cv in book
        ],
        "subspace int, cluster int, cv array<double>",
    )
    store.dump(coarse, f"{name}__coarse")
    store.dump(books, f"{name}__books")
    store.dump(index["coded"], f"{name}__coded")


def load_ivfpq_index(
    spark,
    store,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Load a persisted IVF+PQ index back into the dict shape
    ivfpq_query_index consumes.  The centroid/codebook tables are tiny
    (nlist + m*k rows) and collect to driver literals — the same
    inline-literal scoring shape training produces; the coded corpus
    stays a lazy DataFrame scan."""
    coarse = sorted(
        (r["cluster"], list(r["cv"]))
        for r in store.load(spark, f"{name}__coarse").collect()
    )
    brows = store.load(spark, f"{name}__books").collect()
    nsub = max(r["subspace"] for r in brows) + 1
    books = [
        sorted(
            (r["cluster"], list(r["cv"]))
            for r in brows
            if r["subspace"] == j
        )
        for j in range(nsub)
    ]
    coded = store.load(spark, f"{name}__coded")
    dim = len(books[0][0][1]) * nsub
    # payload columns survive the parquet round trip inside __coded;
    # restore the index's payload tuple by inference so filtered search
    # works off a reloaded artifact exactly as off a fresh build
    payload = tuple(
        c for c in coded.columns
        if c not in (id_col, vec_col, "codes", "cluster")
    )
    return {"coarse": coarse, "books": books, "coded": coded,
            "id_col": id_col, "vec_col": vec_col, "dim": dim,
            "payload": payload}


def save_ivf_index(index: dict, store, name: str) -> None:
    """Persist a trained full-precision IVF index through the named
    parquet Store — the artifact shape of :func:`ivf_build_index`, two
    tables, no pickles:

    ``{name}__centroids`` (cluster, cv)                    — quantizer
    ``{name}__binned``    (id, vec, payload..., cluster)   — inverted lists

    At scale write ``__binned`` bucketed by ``cluster`` so probes prune
    files instead of scanning; payload columns (filtered search) ride
    in the binned table."""
    spark = index["binned"].sparkSession
    cents = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in index["centroids"]],
        "cluster int, cv array<double>",
    )
    store.dump(cents, f"{name}__centroids")
    store.dump(index["binned"], f"{name}__binned")


def load_ivf_index(
    spark,
    store,
    name: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Load a persisted IVF index back into the dict shape
    ivf_query_index consumes; payload columns are re-inferred from the
    binned table so filtered search works unchanged."""
    cents = sorted(
        (r["cluster"], list(r["cv"]))
        for r in store.load(spark, f"{name}__centroids").collect()
    )
    binned = store.load(spark, f"{name}__binned")
    payload = tuple(
        c for c in binned.columns if c not in (id_col, vec_col, "cluster")
    )
    return {"centroids": cents, "binned": binned, "id_col": id_col,
            "vec_col": vec_col, "payload": payload}
