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

import ast
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


def ldlt_solve_steps(n: int) -> list[tuple[str, str]]:
    """Generate the EXACT arithmetic sequence solving the symmetric
    ``n x n`` system ``A b = v`` via LDL^T (no pivoting, no sqrt) as
    ``(name, expression)`` assignment pairs over names ``a{i}{j}``
    (i <= j, 1-based) and ``v{i}``, producing ``b1..b{n}``.

    Every expression is FULLY parenthesized and uses only ``+ - * /``,
    so the identical string evaluates to the identical IEEE double in
    Python ``eval`` and in DuckDB SQL (both engines' + - * / are
    correctly rounded) — this single generator IS the cross-engine
    determinism contract for k != 2 IRLS: the driver solve and the
    oracle replay the same expression tree by construction, the same
    discipline the hand-written 3x3 adjugate gives the k=2 path.
    LDL^T without pivoting is stable here because X'WX is symmetric
    positive definite (w > 0) — the standard normal-equations setting."""
    steps: list[tuple[str, str]] = []

    def a(i: int, j: int) -> str:
        i, j = min(i, j), max(i, j)
        return f"a{i}{j}"

    for j in range(1, n + 1):
        e = a(j, j)
        for k in range(1, j):
            e = f"({e} - ((l{j}{k} * l{j}{k}) * d{k}))"
        steps.append((f"d{j}", e))
        for i in range(j + 1, n + 1):
            e = a(i, j)
            for k in range(1, j):
                e = f"({e} - ((l{i}{k} * l{j}{k}) * d{k}))"
            steps.append((f"l{i}{j}", f"({e} / d{j})"))
    for i in range(1, n + 1):
        e = f"v{i}"
        for k in range(1, i):
            e = f"({e} - (l{i}{k} * y{k}))"
        steps.append((f"y{i}", e))
    for i in range(n, 0, -1):
        e = f"(y{i} / d{i})"
        for k in range(i + 1, n + 1):
            e = f"({e} - (l{k}{i} * b{k}))"
        steps.append((f"b{i}", e))
    return steps


def _eval_expr(node: ast.AST, env: dict) -> float:
    """Recursive arithmetic-only AST evaluator: names, numeric
    constants, unary minus, and binary ``+ - * /``.  Python's float
    binops ARE IEEE-754 correctly-rounded double ops, so this computes
    the identical bits ``eval`` did — with no code-execution surface:
    any other node type (calls, attributes, subscripts, comparisons)
    fails loudly."""
    if isinstance(node, ast.Expression):
        return _eval_expr(node.body, env)
    if isinstance(node, ast.BinOp):
        lhs = _eval_expr(node.left, env)
        rhs = _eval_expr(node.right, env)
        if isinstance(node.op, ast.Add):
            return lhs + rhs
        if isinstance(node.op, ast.Sub):
            return lhs - rhs
        if isinstance(node.op, ast.Mult):
            return lhs * rhs
        if isinstance(node.op, ast.Div):
            return lhs / rhs
        raise ValueError(f"disallowed operator: {ast.dump(node.op)}")
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_eval_expr(node.operand, env)
    if isinstance(node, ast.Name):
        if node.id not in env:
            raise ValueError(f"unbound name: {node.id}")
        return env[node.id]
    if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
        return node.value
    raise ValueError(f"disallowed expression node: {ast.dump(node)}")


def _eval_steps(steps: list[tuple[str, str]], env: dict) -> dict:
    """Evaluate generated assignment steps in order.  The expressions
    come from :func:`ldlt_solve_steps` (our own generator — fully
    parenthesized arithmetic over known names), but are evaluated by a
    closed arithmetic AST walker rather than ``eval``: a caller passing
    externally influenced (name, expr) pairs gets a ``ValueError``, not
    code execution.  Bit-exactness is unchanged — the walker performs
    the same IEEE double ``+ - * /`` in the same tree order."""
    env = dict(env)
    for name, expr in steps:
        env[name] = _eval_expr(ast.parse(expr, mode="eval"), env)
    return env


def logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 3,
) -> list[dict]:
    """Train logistic regression by IRLS over (intercept, *feature_cols)
    and return the FULL coefficient trajectory
    ``[{"it": 1, "b0": ., "b1": ., ...}, ...]`` (6dp grid).

    Any number of features k >= 1: the normal-equation sums are
    (k+1)(k+2)/2 + (k+1) BIGINT-quantized columns in ONE map-side
    combinable aggregate per iteration, one collected row, and a
    driver-side (k+1) x (k+1) solve.  k = 2 keeps the original
    hand-written symmetric 3x3 adjugate (bit-stable vs the r7 driver
    records); every other k solves via the generated LDL^T sequence
    (:func:`ldlt_solve_steps`) whose oracle replays the identical
    expression strings.  Starting point b = 0 (so iteration 1's weights
    are exactly 1/4 — replayable)."""
    k = len(feature_cols)
    if k < 1:
        raise ValueError("logistic_irls needs at least 1 feature column")
    n = k + 1
    xcols = [F.col(c) for c in feature_cols]
    yc = F.col(label_col).cast("double")
    steps = None if k == 2 else ldlt_solve_steps(n)

    beta = [0.0] * n
    traj: list[dict] = []
    for it in range(1, iters + 1):
        eta = F.lit(beta[0])
        for bi, xc in zip(beta[1:], xcols):
            eta = eta + F.lit(bi) * xc
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        z = eta + (yc - mu) / w
        xs = [F.lit(1.0), *xcols]
        aggs = []
        names_a = []
        for i in range(n):
            for j in range(i, n):
                nm = f"a{i + 1}{j + 1}"
                names_a.append(nm)
                aggs.append(F.sum(_quant(w * xs[i] * xs[j])).alias(nm))
        names_v = [f"v{i + 1}" for i in range(n)]
        for i in range(n):
            aggs.append(F.sum(_quant(w * xs[i] * z)).alias(names_v[i]))
        row = df.agg(*aggs).collect()[0]  # ONE bounded row per iteration
        vals = {nm: row[nm] / float(_Q) for nm in names_a + names_v}
        if k == 2:
            nb = _solve3_adjugate(
                vals["a11"], vals["a12"], vals["a13"], vals["a22"],
                vals["a23"], vals["a33"], vals["v1"], vals["v2"],
                vals["v3"],
            )
        else:
            env = _eval_steps(steps, vals)
            nb = [env[f"b{i + 1}"] for i in range(n)]
        beta = [_round6(b) for b in nb]
        traj.append({"it": it, **{f"b{i}": beta[i] for i in range(n)}})
    return traj


def save_model(traj: list[dict], feature_cols: list[str], spark, store,
               name: str) -> None:
    """Persist a trained IRLS model through the named parquet Store
    (datasets.lookup.Store — S19, the same pattern as the IVFPQ index
    and the BPE merge table): one table ``{name}__logit`` holding the
    FULL trajectory plus the feature-column names, so a later session
    can audit convergence, not just score.  A trained quality gate is a
    first-class artifact — train once on the full corpus, then every
    scoring job (batch backfills, the streaming curation DAG's offline
    leg) reloads coefficients without touching the corpus again."""
    n = len(feature_cols) + 1
    rows = [
        (t["it"], i, f"b{i}",
         feature_cols[i - 1] if i else "__intercept__", t[f"b{i}"])
        for t in traj
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "it int, pos int, coef string, feature string, value double"
    )
    store.dump(df, f"{name}__logit")


def load_model(spark, store, name: str) -> tuple[tuple, list[str], list[dict]]:
    """Load a persisted IRLS model: returns (final betas tuple, the
    feature column names in training order, the full trajectory).  The
    table is iters x (k+1) rows — driver-literal scale by
    construction."""
    rows = store.load(spark, f"{name}__logit").orderBy("it", "pos").collect()
    iters = max(r["it"] for r in rows)
    traj = []
    feats: list[str] = []
    for it in range(1, iters + 1):
        step = {"it": it}
        for r in rows:
            if r["it"] == it:
                step[r["coef"]] = r["value"]
                if it == 1 and r["pos"] > 0:
                    feats.append(r["feature"])
        traj.append(step)
    last = traj[-1]
    beta = tuple(last[f"b{i}"] for i in range(len(feats) + 1))
    return beta, feats, traj


def logistic_score(
    df: DataFrame,
    feature_cols: list[str],
    beta: tuple,
    out: str = "prob",
) -> DataFrame:
    """Map-side scoring with trained coefficients: one projection, no
    shuffle — the shape that scores a 100 TB corpus on the scan."""
    if len(beta) != len(feature_cols) + 1:
        raise ValueError(
            f"beta has {len(beta)} coefficients; expected intercept + "
            f"{len(feature_cols)} features = {len(feature_cols) + 1}"
        )
    eta = F.lit(beta[0])
    for bi, c in zip(beta[1:], feature_cols):
        eta = eta + F.lit(bi) * F.col(c)
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))
