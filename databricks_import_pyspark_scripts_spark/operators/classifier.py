"""Distributed logistic regression (Newton / IRLS) — the quality-filter
training loop a corpus pipeline runs over weak labels (fasttext-style
quality classifiers, language filters, toxicity gates).

Scale shape, same as ``embedding_stats``: each TASK reduces its whole
partition to ONE (n, gradient[d+1], hessian[(d+1)^2], loss) partial via
numpy GEMM, a 64-way tree level combines partials before the driver —
the corpus never leaves the executors; the driver sums <= 64 rows of
O(d^2) numbers and solves a (d+1)-dim Newton system per iteration. Feature
dims are small by construction (hand-crafted quality signals), so the
driver work is microseconds; the corpus is scanned ``iters`` times and
nothing else moves.

Reference parity: none — north-star extension surface for the
training-data pipeline tier.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: fan-in of the pre-driver combine level (shared shape with
#: embedding_stats.TREE_FAN): the driver sees <= this many partials per
#: Newton iteration regardless of the corpus's partition count
TREE_FAN = 64

_PARTIAL_SCHEMA = ("n long, grad array<double>, hess array<double>, "
                   "loss double")


def newton_partials_df(df: DataFrame, feature_col: str, label_col: str,
                       dim: int, w_cur: np.ndarray) -> DataFrame:
    """One Newton iteration's distributed half: per-TASK
    (n, grad, hess, loss) partials (accumulated across each task's
    Arrow batches), tree-combined ``TREE_FAN``-to-1 before the driver
    (VERDICT r10 #2: one partial per batch collected O(corpus/batch)
    driver bytes at 100 TB). Exposed so tests can pin the
    driver-received row bound."""
    d1 = dim + 1

    def _partials(batches):
        import pandas as pd

        n = 0
        grad = np.zeros(d1)
        hess = np.zeros((d1, d1))
        loss = 0.0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[feature_col].tolist(), dtype=np.float64)
            if x.shape[1] != dim:
                raise ValueError(f"feature dim {x.shape[1]} != {dim}")
            xb = np.hstack([np.ones((len(x), 1)), x])
            y = pdf[label_col].to_numpy(dtype=np.float64)
            z = xb @ w_cur
            p = 1.0 / (1.0 + np.exp(-z))
            grad += xb.T @ (p - y)
            sdiag = np.maximum(p * (1.0 - p), 1e-12)
            hess += (xb * sdiag[:, None]).T @ xb
            loss += float(np.sum(
                np.log1p(np.exp(-np.abs(z)))
                + np.where(z > 0, (1.0 - y) * z, -y * z)))
            n += len(x)
        if n:
            yield pd.DataFrame({
                "n": [n], "grad": [grad.tolist()],
                "hess": [hess.reshape(-1).tolist()], "loss": [loss]})

    def _combine(batches):
        import pandas as pd

        n = 0
        grad = np.zeros(d1)
        hess = np.zeros(d1 * d1)
        loss = 0.0
        for pdf in batches:
            for i in range(len(pdf)):
                n += int(pdf["n"].iloc[i])
                grad += np.asarray(pdf["grad"].iloc[i])
                hess += np.asarray(pdf["hess"].iloc[i])
                loss += float(pdf["loss"].iloc[i])
        if n:
            yield pd.DataFrame({
                "n": [n], "grad": [grad.tolist()],
                "hess": [hess.tolist()], "loss": [loss]})

    partials = (df.select(feature_col, label_col)
                .mapInPandas(_partials, _PARTIAL_SCHEMA))
    if partials.rdd.getNumPartitions() <= TREE_FAN:
        return partials        # already under the driver row bound
    return partials.repartition(TREE_FAN).mapInPandas(_combine,
                                                      _PARTIAL_SCHEMA)


def logreg_train_newton(df: DataFrame, feature_col: str, label_col: str,
                        dim: int, iters: int = 8,
                        ridge: float = 1e-6):
    """Fit ``P(y=1|x) = sigmoid(w0 + w . x)`` by Newton's method.
    Returns ``(weights, losses)`` — weights[(d+1)] with the intercept
    FIRST, and the per-iteration mean log-loss trace (monotone-ish
    decreasing; the caller's convergence evidence). ``ridge`` keeps the
    Hessian invertible on separable data."""
    d1 = dim + 1
    # Each Newton iteration is its own collect() job, so exchange reuse
    # cannot span iterations: an unmaterialized ``df`` re-executes its whole
    # feature pipeline (typically interpreted token/regexp expressions over
    # the corpus) once per iteration — iters+0 extra full corpus passes.
    # Materialize the (features, label) projection ONCE (guide §2.4/§5):
    # d+1 doubles per row, far narrower than the corpus text it derives
    # from, pinned MEMORY_AND_DISK for the few seconds the loop runs.
    df = df.select(feature_col, label_col).localCheckpoint(eager=True)
    w = np.zeros(d1)
    losses: list[float] = []
    for _ in range(iters):
        parts = newton_partials_df(df, feature_col, label_col, dim,
                                   w.copy()).collect()
        if not parts:
            raise ValueError("no rows to train on")
        n = sum(int(r["n"]) for r in parts)
        grad = np.sum([np.asarray(r["grad"]) for r in parts], axis=0)
        hess = np.sum([np.asarray(r["hess"]).reshape(d1, d1)
                       for r in parts], axis=0)
        losses.append(float(sum(r["loss"] for r in parts)) / n)
        w = w - np.linalg.solve(hess + ridge * np.eye(d1), grad)
    return w, losses


def logreg_score_col(features: Column, weights) -> Column:
    """``sigmoid(w0 + w . x)`` as a pure column expression (JVM-side,
    whole-stage codegen — scoring 100 TB is a scan, not a UDF)."""
    w = [float(v) for v in weights]
    z = F.lit(w[0])
    feats = F.transform(features, lambda v: v.cast("double"))
    z = z + F.aggregate(
        F.zip_with(feats, F.array(*[F.lit(v) for v in w[1:]]),
                   lambda x, c: x * c),
        F.lit(0.0), lambda acc, v: acc + v)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_reference(x: np.ndarray, y: np.ndarray, iters: int = 8,
                     ridge: float = 1e-6) -> np.ndarray:
    """Driver-side numpy twin of ``logreg_train_newton`` (same algorithm,
    single matrix) — the consistency test's ground truth."""
    xb = np.hstack([np.ones((len(x), 1)), np.asarray(x, dtype=np.float64)])
    w = np.zeros(xb.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xb @ w)))
        grad = xb.T @ (p - np.asarray(y, dtype=np.float64))
        sdiag = np.maximum(p * (1.0 - p), 1e-12)
        hess = (xb * sdiag[:, None]).T @ xb
        w = w - np.linalg.solve(hess + ridge * np.eye(len(w)), grad)
    return w
