"""In-engine model training primitives ([ext] — the curation-loop
closer: the quality classifier that *scores* documents
(queries/round4.py q_quality_model_score) is *trained* here, on the
same engine that runs the pipeline).

Full-batch logistic-regression gradient descent as pure DataFrame
aggregation: per iteration ONE corpus scan computing the
dim-bounded gradient (map-side partial aggregation, a ``dim+1``-row
collect), weights updated driver-side and re-broadcast as literals.
At 100 TB that is k scans for k iterations with no shuffle beyond the
aggregate — the classic "broadcast parameters, reduce gradients"
data-parallel shape (parameter-server with k=1 server, 0 state).

No pyspark.ml dependency: MLlib's LogisticRegression carries
breeze/LBFGS machinery; curation models are tiny (a handful of
features), so transparent, deterministic full-batch GD in DataFrame
ops is both simpler and auditable — and exactly reproducible against
a numpy reference (tests/test_training.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_gradient(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    weights: list[float],
) -> tuple[list[float], int]:
    """One full-batch gradient of binary-cross-entropy loss:
    ``grad_j = Σ_rows (σ(w·x) − y) · x_j`` with x_0 ≡ 1 (bias).

    Returns ``(gradient, n_rows)`` — a ``len(weights)``-element list
    (bias first).  One aggregate job; the collect is dim-bounded.
    """
    z = F.lit(weights[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j + 1]) * F.col(c).cast("double")
    err = (sigmoid(z) - F.col(label_col).cast("double")).alias("__err")
    terms = df.select(
        err,
        *[F.col(c).cast("double").alias(f"__x{j}") for j, c in enumerate(feature_cols)],
    )
    row = terms.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__err").alias("__g0"),
        *[
            F.sum(F.col("__err") * F.col(f"__x{j}")).alias(f"__g{j + 1}")
            for j in range(len(feature_cols))
        ],
    ).first()
    n = row["__n"]
    return [row[f"__g{j}"] for j in range(len(feature_cols) + 1)], n


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    iterations: int = 20,
    init: list[float] | None = None,
) -> list[float]:
    """Train by full-batch GD: k iterations × (one scan + one
    dim-bounded collect).  Returns the weight vector (bias first).

    Deterministic up to float-sum ordering of the gradient aggregate
    (the usual data-parallel contract; the one-step declared query
    q_logreg_step pins a fully order-independent decimal-summed
    variant for the cross-engine oracle).
    """
    w = list(init) if init is not None else [0.0] * (len(feature_cols) + 1)
    if len(w) != len(feature_cols) + 1:
        raise ValueError(
            f"init has {len(w)} weights; need {len(feature_cols) + 1} (bias first)"
        )
    for _ in range(iterations):
        grad, n = logreg_gradient(df, feature_cols, label_col, w)
        if n == 0:
            raise ValueError("logreg_train: empty input")
        w = [wi - lr * gi / n for wi, gi in zip(w, grad)]
        if any(not math.isfinite(x) for x in w):
            raise ValueError(
                "logreg_train diverged (non-finite weights) — lower lr"
            )
    return w
