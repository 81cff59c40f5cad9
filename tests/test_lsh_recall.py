"""MinHash-LSH candidate recall vs exact Jaccard ground truth.

The banding theory says a pair with true shingle-Jaccard s is surfaced
with probability 1 - (1 - s^r)^b (r rows/band, b bands) — for the
production setting (64 hashes, 32 bands, r=2) that is ~0.9999 at s=0.5
and ~0.97 at s=0.25.  This test builds a corpus with KNOWN overlap
structure (word-level mutations of base documents), computes exact
Jaccard in pure python, and asserts the Spark LSH pipeline's candidate
recall meets the theoretical floor — the dedup-side analog of the ANN
ladder's recall@k report."""

from __future__ import annotations

import random


def _shingles(text: str, k: int = 3) -> set:
    w = text.split()
    if len(w) < k:
        return {" ".join(w)} if w else set()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def test_lsh_candidate_recall_meets_banding_theory(spark):
    from pyspark.sql import functions as F

    from financial_data_science_spark.functions.similarity import (
        minhash_candidates,
    )

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(400)]
    docs, texts = [], {}
    did = 0
    for base in range(30):
        words = [rng.choice(vocab) for _ in range(60)]
        texts[did] = " ".join(words)
        docs.append((did, texts[did]))
        did += 1
        # one high-overlap mutant (few swaps) and one medium mutant
        for n_mut in (3, 12):
            mut = list(words)
            for _ in range(n_mut):
                mut[rng.randrange(len(mut))] = rng.choice(vocab)
            texts[did] = " ".join(mut)
            docs.append((did, texts[did]))
            did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    truth = {}
    ids = sorted(texts)
    sh = {i: _shingles(texts[i]) for i in ids}
    for i in ids:
        for j in ids:
            if i < j and sh[i] and sh[j]:
                s = len(sh[i] & sh[j]) / len(sh[i] | sh[j])
                if s >= 0.5:
                    truth[(i, j)] = s
    assert len(truth) >= 30, "fixture must contain real near-dup pairs"

    cand = {
        (r["left_id"], r["right_id"])
        for r in minhash_candidates(df, num_hashes=64, bands=32)
        .select("left_id", "right_id")
        .collect()
    }
    hit = sum(1 for p in truth if p in cand or (p[1], p[0]) in cand)
    recall = hit / len(truth)
    # theory floor at s=0.5 is ~0.9999; leave slack for shingle-set
    # border effects but stay far above a broken-banding regression
    assert recall >= 0.95, (recall, len(truth))
