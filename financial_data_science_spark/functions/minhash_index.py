"""Incremental MinHash-LSH dedup index: hash the standing corpus ONCE,
then near-dup-screen each arriving batch by hashing only the increment.

The batch LSH pipeline (similarity.minhash_candidates) re-shingles and
re-hashes the WHOLE corpus per run — right for a one-shot dedup sweep,
wrong for ingestion, where a 100 TB standing corpus would pay its full
shingle/hash/band cost on every arriving slice.  This module is the
dedup-side analog of the ANN train/add-vs-search split
(similarity.ivf_build_index / ivf_query_index):

- :func:`minhash_build_index` — the ADD-ONCE half.  Shingle, hash, and
  band the corpus a single time; returns the banded bucket table
  ``(corpus_id, band, bhash)`` plus the per-doc signature table.  On a
  cluster the equivalent at rest is :func:`minhash_write_index` —
  buckets written BUCKETED BY the band hash, so the per-batch probe
  join reads co-located buckets and shuffles ONLY the increment.
- :func:`minhash_query_index` — the per-batch half.  Hashes only the
  new docs, joins their band keys against the index buckets, and
  estimates signature similarity for the (new, corpus) collision pairs.
  Per-batch cost is O(increment), independent of corpus size except for
  the bucket-join probe itself.

Scope contract: the query returns CROSS pairs (new vs corpus) only.
Within-increment duplicates are the batch problem the existing
minhash_candidates solves on the (small) increment; corpus-vs-corpus
pairs were resolved when the corpus was ingested.  A doc id present on
both sides is the "already ingested" case and is excluded.

Signatures are per-doc-independent (no corpus statistics), so
incremental results are EXACT: build+query on a (corpus, increment)
split yields precisely the cross-pair subset of a full batch run —
pinned by parity test and by the DuckDB oracle of the
``minhash_index_increment`` catalog entry.  The one corpus-statistic
variant, stop-shingle ``max_df`` filtering, is deliberately NOT
computed per batch: a production ingest freezes the stop-shingle
census from the standing corpus (else the kept-shingle set drifts with
every batch and old signatures go stale); freezing is the composition
``minhash_build_index(corpus, ...)`` after a corpus-level census —
left to the caller, documented here so nobody "fixes" it into a
per-batch census.

Reference: the reference repo has no incremental dedup (its dedup
recipes re-run in full); this is part of the LLM-training-pipeline
surface built for the 100 TB ingestion story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_science_spark.functions.similarity import minhash_signatures

_MOD31 = (1 << 31) - 1


def _band_key(b: int, rows_per_band: int, portable: bool):
    """Band key over h{i} signature columns — same fold family as
    similarity.minhash_candidates (xxhash-backed F.hash in production,
    the 65537-fold arithmetic key when the oracle must replay it).

    Deliberately duplicated from the band_key closure in
    similarity.minhash_candidates: similarity.py is source-hash-pinned
    by the sealed bench floor's minhash_lsh_production canary
    (tools/floorlib.py), so the shared helper belongs there only after
    the next re-seal (SCALE.md r12 pointers).  Until then drift is
    pinned by the cross-formulation parity tests and the catalog
    oracles, which replay this exact fold."""
    cols = [
        F.col(f"h{i}")
        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
    ]
    if not portable:
        return F.hash(*cols)
    acc = F.lit(0).cast("long")
    for c in cols:  # h < 2^31 so the running product stays < 2^48
        acc = (acc * F.lit(65537) + c) % F.lit(_MOD31)
    return acc


def _banded(
    sig: DataFrame,
    id_col: str,
    out_id: str,
    num_hashes: int,
    bands: int,
    portable: bool,
) -> DataFrame:
    """(out_id, band, bhash) rows from a minhash_signatures frame.

    The signature array is deliberately NOT carried through the band
    explode: the bucket join shuffles 3 small ints per row, and the
    similarity estimate re-joins the one-row-per-doc signature tables
    AFTER pair dedup (the band_candidates lesson: hauling the k-long
    array through both sides of the bucket join costs more than the
    extra join)."""
    rpb = num_hashes // bands
    return sig.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        _band_key(b, rpb, portable).alias("bhash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band__"),
    ).select(out_id, "__band__.band", "__band__.bhash")


def minhash_build_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    portable: bool = False,
    persist: bool = False,
) -> dict:
    """ADD-ONCE half of incremental MinHash dedup: shingle/hash/band the
    standing corpus a single time.

    Returns ``{"buckets": DataFrame[(corpus_id, band, bhash)],
    "sigs": DataFrame[(corpus_id, __csig__)], ...params}``.  Both frames
    are what the per-batch probe join needs and nothing more; the raw
    text never needs to be re-read once the index exists.

    ``persist=True`` materializes both frames with an eager
    localCheckpoint (the single-process 'index on disk' stance, same as
    ivf_build_index); on a cluster use :func:`minhash_write_index`,
    which buckets the table by ``bhash`` so probe joins skip the
    corpus-side exchange entirely.
    """
    sig = minhash_signatures(
        docs, id_col, text_col, shingle_k, num_hashes, seed, portable=portable
    )
    if persist:
        # checkpoint the SHARED signature frame once — the corpus is
        # hashed exactly one time, and buckets (a band-explode
        # projection) re-materializes from the checkpointed rows, not
        # from text.  Checkpointing buckets/sigs independently instead
        # would run the full shingle/hash aggregate twice.
        sig = sig.localCheckpoint(eager=True)
    buckets = _banded(sig, id_col, "corpus_id", num_hashes, bands, portable)
    sigs = sig.select(
        F.col(id_col).alias("corpus_id"), F.col("__sig__").alias("__csig__")
    )
    if persist:
        buckets = buckets.localCheckpoint(eager=True)
    return {
        "buckets": buckets,
        "sigs": sigs,
        "shingle_k": shingle_k,
        "num_hashes": num_hashes,
        "bands": bands,
        "seed": seed,
        "portable": portable,
    }


def minhash_query_index(
    new_docs: DataFrame,
    index: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_est: float | None = None,
) -> DataFrame:
    """Per-batch half: near-dup pairs between ``new_docs`` and the
    indexed corpus, hashing ONLY the increment.

    Output: ``(new_id, corpus_id, est_jaccard)`` distinct pairs whose
    band keys collide, with the usual matched-minhash-fraction estimate;
    ``min_est`` filters server-side.  The physical shape is the one that
    survives 1000 executors: the increment's band keys shuffle on
    (band, bhash) against the bucket table (co-located and exchange-free
    when the index is at rest via :func:`minhash_write_index`), pairs
    dedup BEFORE the signature arrays are joined back, and the corpus
    text is never touched.
    """
    num_hashes = index["num_hashes"]
    sig = minhash_signatures(
        new_docs,
        id_col,
        text_col,
        index["shingle_k"],
        num_hashes,
        index["seed"],
        portable=index["portable"],
    )
    nb = _banded(
        sig, id_col, "new_id", num_hashes, index["bands"], index["portable"]
    )
    pairs = (
        nb.join(index["buckets"], ["band", "bhash"])
        .filter(F.col("new_id") != F.col("corpus_id"))
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    nsig = sig.select(
        F.col(id_col).alias("new_id"), F.col("__sig__").alias("__nsig__")
    )
    matched = F.size(
        F.filter(
            F.zip_with(
                F.col("__nsig__"), F.col("__csig__"), lambda a, b: a == b
            ),
            lambda x: x,
        )
    )
    out = (
        pairs.join(nsig, "new_id")
        .join(index["sigs"], "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (matched / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
    )
    if min_est is not None:
        out = out.filter(F.col("est_jaccard") >= min_est)
    return out


def minhash_append_index(
    index: dict,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = False,
) -> dict:
    """Grow the index with an ingested batch (the post-dedup half of the
    ingestion loop: probe with :func:`minhash_query_index`, drop the
    near-dups, append the survivors).  Hashes ONLY ``new_docs`` — the
    whole body delegates to :func:`minhash_build_index` on the batch so
    the two paths can never drift — and unions the new rows onto the
    index: per-batch hashing cost is O(batch), and probe results equal
    a from-scratch rebuild on corpus + batch exactly (per-doc-independent
    signatures; pinned by parity test).

    ID contract: ``new_docs`` ids must be NEW — the near-dup probe drops
    text duplicates, not id collisions, so re-appending an id already in
    the index (a retried batch, an id reuse) leaves duplicate
    ``corpus_id`` rows that break the query's distinct-pairs output.
    Idempotence is the caller's (e.g. anti-join the batch on ids already
    at rest — the upsert pattern in sources/coercion.py).

    Lineage: each append adds one union leg.  ``persist=True``
    checkpoints the UNIONED frames — an explicit O(index) compaction
    for in-memory loops (checkpointing only the increment would leave
    an ever-deeper union tree and per-probe re-analysis cost).  The
    production loop avoids both costs by living AT REST: write the
    returned ``new_buckets`` / ``new_sigs`` (the increment-only frames)
    with ``minhash_write_index(..., mode='append')`` — same bucket
    spec, O(batch) written — and re-open via
    :func:`minhash_read_index`."""
    inc = minhash_build_index(
        new_docs,
        id_col,
        text_col,
        index["shingle_k"],
        index["num_hashes"],
        index["bands"],
        index["seed"],
        index["portable"],
        persist=False,
    )
    buckets = index["buckets"].unionByName(inc["buckets"])
    sigs = index["sigs"].unionByName(inc["sigs"])
    if persist:
        buckets = buckets.localCheckpoint(eager=True)
        sigs = sigs.localCheckpoint(eager=True)
    return {
        **index,
        "buckets": buckets,
        "sigs": sigs,
        "new_buckets": inc["buckets"],
        "new_sigs": inc["sigs"],
    }


def minhash_write_index(
    index: dict, table_prefix: str, n_buckets: int = 32, mode: str = "overwrite",
) -> None:
    """Persist the index AT REST, bucketed for exchange-free probes:
    ``{prefix}_buckets`` bucketed+sorted by the probe join key
    ``(band, bhash)`` and ``{prefix}_sigs`` bucketed by ``corpus_id``
    (the estimate join key).  A later :func:`minhash_read_index` +
    query join then shuffles only the increment — the corpus side reads
    co-located buckets (one fewer Exchange than the in-memory index
    plan; asserted in tests).

    ``mode='append'`` is the ingestion loop's O(batch) write: pass the
    increment-only frames from :func:`minhash_append_index`
    (``{"buckets": idx["new_buckets"], "sigs": idx["new_sigs"]}``) and
    the new rows land in the SAME bucket spec without rewriting the
    corpus.  Do not overwrite a prefix from an index that was READ from
    that prefix — Spark refuses to overwrite a table its plan scans."""
    from financial_data_science_spark.operators.skew import write_bucketed

    write_bucketed(
        index["buckets"], f"{table_prefix}_buckets", ["band", "bhash"],
        n_buckets, sort_key=["band", "bhash"], mode=mode,
    )
    write_bucketed(
        index["sigs"], f"{table_prefix}_sigs", "corpus_id", n_buckets, mode=mode,
    )


def minhash_read_index(
    spark: SparkSession,
    table_prefix: str,
    shingle_k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    portable: bool = False,
) -> dict:
    """Re-open an at-rest index written by :func:`minhash_write_index`.
    The hash-family params are the caller's contract (they are not
    inferable from the tables); pass the same values used at build."""
    return {
        "buckets": spark.table(f"{table_prefix}_buckets"),
        "sigs": spark.table(f"{table_prefix}_sigs"),
        "shingle_k": shingle_k,
        "num_hashes": num_hashes,
        "bands": bands,
        "seed": seed,
        "portable": portable,
    }
