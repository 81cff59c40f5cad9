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


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries, score every corpus row,
    window top-k.  Exact baseline; O(|Q|·|C|) score rows but only the
    queries side is replicated."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias(query_id), F.col(vec_col).alias("__qv__")
        )
    )
    scored = corpus.join(q, F.col(query_id) != F.col(id_col)).select(
        query_id,
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("__qv__"), F.col(vec_col)).alias("score"),
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
    """All (left_id, right_id) pairs with cosine >= threshold, left broadcast."""
    l = F.broadcast(
        left.select(F.col(id_col).alias("left_id"), F.col(vec_col).alias("__lv__"))
    )
    out = right.join(l, F.col("left_id") < F.col(id_col)).select(
        "left_id",
        F.col(id_col).alias("right_id"),
        cosine(F.col("__lv__"), F.col(vec_col)).alias("score"),
    )
    return out.filter(F.col("score") >= threshold)


def hyperplane_bucket(vec: Column, n_planes: int = 12, seed: int = 7) -> Column:
    """Random-hyperplane LSH bucket id for cosine ANN at scale.

    Deterministic pseudo-hyperplanes: component i of plane p weighs
    hash(seed, p, i) mapped to ±1; bucket = sign bits packed to an int.
    Collisions preserve cosine locality; search only within a bucket (and
    optionally neighboring buckets by flipping one bit).
    """
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                idx,
                lambda v, i: v.cast("double")
                * F.when(F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), 2) == 0, 1.0).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket * 2 + F.when(proj >= 0, 1).otherwise(0)
    return bucket


# ---------------------------------------------------------------- minhash

def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature as ``h0..h{k-1}`` columns + ``__sig__`` array.

    Physical shape: explode distinct shingles -> ONE hash aggregate with k
    ``min(xxhash64(seed_i, shingle))`` columns (map-side partial combine).
    This deliberately avoids a k-wide nested array expression per row,
    which blows up the Catalyst plan and codegen when the signature is
    re-referenced per band.
    """
    exploded = docs.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_k)).alias("__shingle__")
    )
    sig = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(seed + i), F.col("__shingle__"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    return sig.withColumn("__sig__", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]))


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on (band, hash).

    rows/bands = num_hashes/bands hashes per band; a pair is a candidate if
    any band hashes equal.  Scale shape: explode bands (b rows per doc),
    shuffle on the band hash, self-join within buckets — no cross join.
    Returns distinct (left_id, right_id) candidates with estimated
    signature similarity.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, shingle_k, num_hashes, seed)
    banded = sig.select(
        id_col,
        "__sig__",
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
    ).select(id_col, "__sig__", "__band__.band", "__band__.bhash")
    l = banded.select(
        F.col(id_col).alias("left_id"), F.col("__sig__").alias("__lsig__"), "band", "bhash"
    )
    r = banded.select(
        F.col(id_col).alias("right_id"), F.col("__sig__").alias("__rsig__"), "band", "bhash"
    )
    matched = F.size(
        F.filter(
            F.zip_with(F.col("__lsig__"), F.col("__rsig__"), lambda a, b: a == b),
            lambda x: x,
        )
    )
    pairs = (
        l.join(r, ["band", "bhash"])
        .filter(F.col("left_id") < F.col("right_id"))
        .select(
            "left_id",
            "right_id",
            (matched / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )
    return pairs.dropDuplicates(["left_id", "right_id"])


# ---------------------------------------------------------------- simhash

def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """Per-doc SimHash fingerprint (``simhash`` long column).

    Per token: xxhash64; per bit: +1 if set else -1, summed over tokens;
    fingerprint bit = sign of the vote.  Physical shape: explode tokens ->
    one hash aggregate with ``bits`` vote sums -> bit-pack — all JVM-side,
    map-side combinable, no wide nested expressions per row.
    """
    from financial_data_science_spark.functions.text import tokens

    toks = tokens(F.lower(F.col(text_col)))
    exploded = docs.select(F.col(id_col), F.explode(toks).alias("__tok__")).select(
        F.col(id_col), F.xxhash64("__tok__").alias("__h__")
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
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index.

    explode(distinct shingles) -> self-equi-join on shingle -> common counts
    -> jaccard = common / (nA + nB - common).  One shuffle on the shingle
    key; hot shingles can be frequency-capped upstream (stopword shingles
    dominate candidate generation otherwise).
    """
    sh = docs.select(
        F.col(id_col), word_shingles(text_col, k).alias("__sh__")
    ).withColumn("__n__", F.size("__sh__"))
    exploded = sh.select(id_col, "__n__", F.explode("__sh__").alias("shingle"))
    l = exploded.select(
        F.col(id_col).alias("left_id"), F.col("__n__").alias("__nl__"), "shingle"
    )
    r = exploded.select(
        F.col(id_col).alias("right_id"), F.col("__n__").alias("__nr__"), "shingle"
    )
    common = (
        l.join(r, "shingle")
        .filter(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id", "__nl__", "__nr__")
        .agg(F.count(F.lit(1)).alias("__common__"))
    )
    jac = common.withColumn(
        "jaccard",
        F.col("__common__")
        / (F.col("__nl__") + F.col("__nr__") - F.col("__common__")),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
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
