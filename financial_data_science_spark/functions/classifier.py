"""Distributed trainable classifiers for corpus curation.

A 100 TB curation pipeline eventually outgrows hand-tuned heuristic
quality thresholds (functions/text.py quality_features) and wants a
TRAINED quality filter: fit a small logistic model on labeled docs,
then score the whole corpus map-side.  This module implements logistic
regression via IRLS (iteratively reweighted least squares) as pure
DataFrame aggregations — the classic "ML training as a handful of
distributed sums" pattern:

  per iteration:  eta = X b;  mu = sigmoid(eta);  w = mu(1-mu);
                  z = eta + (y - mu)/w;
                  solve (X'WX) b' = X'Wz  (normal equations)

X'WX and X'Wz for k features are k(k+1)/2 + k sums — ONE map-side
combinable aggregate per iteration, a single collected row, and a
driver-side k x k solve (the same bounded-collect altitude as the BPE
argmax and the Lloyd centroid rows).  No gradient loops over the data,
no Python on the data path.

Cross-engine determinism (the oracle replays the whole trajectory):
every per-row term is quantized to BIGINT micro-units before summing —
integer sums are EXACT and order-independent, so Spark's partition
combine and DuckDB's sequential sum agree bit-for-bit (the float
discipline's rounding-after-sum still exposes ~1e-10 associativity
noise to the grid edge; integer quantization moves the only residual
risk to a per-row ulp landing exactly on a floor boundary, ~1e-15).
The 3x3 solve runs the SAME adjugate expression tree in Python and in
SQL — IEEE +,-,*,/ are correctly rounded, so identical inputs give
identical outputs; only exp/ln are engine-dependent and both sit
upstream of the integer quantization.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# micro-unit quantization grid for the per-row aggregate terms
_Q = 10**6


def _quant(c: Column) -> Column:
    """floor(x * 1e6 + 0.5) as BIGINT — the exact-sum quantization."""
    return F.floor(c * F.lit(float(_Q)) + F.lit(0.5)).cast("long")


def _round6(x: float) -> float:
    """The guarded floor-rounding of queries._rfloor, in pure python —
    same IEEE chain as the SQL spells out."""
    return math.floor(
        math.floor(x * 1e9 + 0.5) / 1e3 + 0.5
    ) / 1e6


def _solve3_adjugate(a11, a12, a13, a22, a23, a33, v1, v2, v3):
    """Solve the symmetric 3x3 system A b = v via the adjugate — the
    EXACT expression tree the oracle SQL replays (identical
    parenthesization, so IEEE arithmetic matches bit-for-bit)."""
    det = (
        a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)
    )
    c11 = a22 * a33 - a23 * a23
    c12 = a13 * a23 - a12 * a33
    c13 = a12 * a23 - a13 * a22
    c22 = a11 * a33 - a13 * a13
    c23 = a12 * a13 - a11 * a23
    c33 = a11 * a22 - a12 * a12
    b1 = (c11 * v1 + c12 * v2 + c13 * v3) / det
    b2 = (c12 * v1 + c22 * v2 + c23 * v3) / det
    b3 = (c13 * v1 + c23 * v2 + c33 * v3) / det
    return b1, b2, b3


def logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
) -> list[dict]:
    """Train logistic regression by IRLS over (intercept, *feature_cols)
    and return the FULL coefficient trajectory
    ``[{"it": 1, "b0": ., "b1": ., "b2": .}, ...]`` (6dp grid).

    Currently k = 2 features + intercept (the adjugate solve is written
    for the symmetric 3x3 — the same closed form the min-variance oracle
    replays); the aggregation pattern generalizes to any k.
    Starting point b = 0 (so iteration 1's weights are exactly 1/4 —
    replayable).  One aggregate + one collected row per iteration."""
    if len(feature_cols) != 2:
        # Hard contract, not a debug assert (asserts vanish under -O and
        # 3 features would silently misindex xs): the 3x3 adjugate solve
        # is written for exactly 2 features + intercept.  The k=2 pin is
        # API — see MIGRATION.md "Trained quality classifier".
        raise ValueError(
            "logistic_irls is pinned to exactly 2 feature columns "
            f"(intercept + 2 -> 3x3 adjugate solve); got {len(feature_cols)}"
        )
    x1c, x2c = (F.col(c) for c in feature_cols)
    yc = F.col(label_col).cast("double")

    beta = (0.0, 0.0, 0.0)
    traj: list[dict] = []
    for it in range(1, iters + 1):
        b0, b1, b2 = beta
        eta = F.lit(b0) + F.lit(b1) * x1c + F.lit(b2) * x2c
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        z = eta + (yc - mu) / w
        xs = [F.lit(1.0), x1c, x2c]
        aggs = []
        names_a = []
        for i in range(3):
            for j in range(i, 3):
                n = f"a{i + 1}{j + 1}"
                names_a.append(n)
                aggs.append(F.sum(_quant(w * xs[i] * xs[j])).alias(n))
        for i in range(3):
            aggs.append(F.sum(_quant(w * xs[i] * z)).alias(f"v{i + 1}"))
        row = df.agg(*aggs).collect()[0]  # ONE bounded row per iteration
        vals = {n: row[n] / float(_Q) for n in
                names_a + ["v1", "v2", "v3"]}
        nb = _solve3_adjugate(
            vals["a11"], vals["a12"], vals["a13"], vals["a22"],
            vals["a23"], vals["a33"], vals["v1"], vals["v2"], vals["v3"],
        )
        beta = tuple(_round6(b) for b in nb)
        traj.append({"it": it, "b0": beta[0], "b1": beta[1],
                     "b2": beta[2]})
    return traj


def logistic_score(
    df: DataFrame,
    feature_cols: list[str],
    beta: tuple,
    out: str = "prob",
) -> DataFrame:
    """Map-side scoring with trained coefficients: one projection, no
    shuffle — the shape that scores a 100 TB corpus on the scan."""
    b0, b1, b2 = beta
    eta = (
        F.lit(b0)
        + F.lit(b1) * F.col(feature_cols[0])
        + F.lit(b2) * F.col(feature_cols[1])
    )
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))
