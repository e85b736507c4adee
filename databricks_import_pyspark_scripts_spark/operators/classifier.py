"""Distributed logistic regression (Newton / IRLS) — the quality-filter
training loop a corpus pipeline runs over weak labels (fasttext-style
quality classifiers, language filters, toxicity gates).

Scale shape, same as ``embedding_stats``: each Arrow batch reduces to
ONE (n, gradient[d+1], hessian[(d+1)^2], loss) partial via numpy GEMM —
the corpus never leaves the executors; the driver sums O(batches * d^2)
numbers and solves a (d+1)-dim Newton system per iteration. Feature
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


def logreg_train_newton(df: DataFrame, feature_col: str, label_col: str,
                        dim: int, iters: int = 8,
                        ridge: float = 1e-6):
    """Fit ``P(y=1|x) = sigmoid(w0 + w . x)`` by Newton's method.
    Returns ``(weights, losses)`` — weights[(d+1)] with the intercept
    FIRST, and the per-iteration mean log-loss trace (monotone-ish
    decreasing; the caller's convergence evidence). ``ridge`` keeps the
    Hessian invertible on separable data."""
    d1 = dim + 1
    w = np.zeros(d1)
    losses: list[float] = []
    for _ in range(iters):
        w_bc = w.copy()

        def _partials(batches, w_cur=w_bc):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.asarray(pdf[feature_col].tolist(),
                               dtype=np.float64)
                if x.shape[1] != dim:
                    raise ValueError(
                        f"feature dim {x.shape[1]} != {dim}")
                xb = np.hstack([np.ones((len(x), 1)), x])
                y = pdf[label_col].to_numpy(dtype=np.float64)
                z = xb @ w_cur
                p = 1.0 / (1.0 + np.exp(-z))
                grad = xb.T @ (p - y)
                sdiag = np.maximum(p * (1.0 - p), 1e-12)
                hess = (xb * sdiag[:, None]).T @ xb
                loss = float(np.sum(
                    np.log1p(np.exp(-np.abs(z)))
                    + np.where(z > 0, (1.0 - y) * z, -y * z)))
                yield pd.DataFrame({
                    "n": [len(x)],
                    "grad": [grad.tolist()],
                    "hess": [hess.reshape(-1).tolist()],
                    "loss": [loss]})

        parts = (df.select(feature_col, label_col)
                 .mapInPandas(_partials,
                              "n long, grad array<double>, "
                              "hess array<double>, loss double")
                 .collect())
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
