"""logreg_train (k-step full-batch GD, one scan + dim-bounded collect
per step) reproduces a numpy reference bit-for-tolerance, improves the
loss, and learns a separable toy problem."""

from __future__ import annotations

import math

import numpy as np
import pytest

from jibaro_spark.operators.training import logreg_gradient, logreg_train


def _np_train(X, y, lr, iters, init):
    w = np.array(init, dtype=np.float64)
    Xb = np.hstack([np.ones((len(X), 1)), X])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w = w - lr * (Xb.T @ (p - y)) / len(y)
    return w


@pytest.fixture(scope="module")
def toy(spark):
    rng = np.random.RandomState(7)
    X = rng.uniform(-1, 1, size=(400, 2))
    y = (X[:, 0] + 2 * X[:, 1] > 0.2).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "x1 double, x2 double, y double",
    )
    return X, y, df


def test_gradient_matches_numpy(toy):
    X, y, df = toy
    w0 = [0.1, -0.2, 0.3]
    grad, n = logreg_gradient(df, ["x1", "x2"], "y", w0)
    Xb = np.hstack([np.ones((len(X), 1)), X])
    p = 1.0 / (1.0 + np.exp(-(Xb @ np.array(w0))))
    expect = Xb.T @ (p - y)
    assert n == len(y)
    np.testing.assert_allclose(grad, expect, rtol=1e-9, atol=1e-9)


def test_train_matches_numpy_and_learns(toy):
    X, y, df = toy
    w = logreg_train(df, ["x1", "x2"], "y", lr=0.8, iterations=25)
    expect = _np_train(X, y, 0.8, 25, [0.0, 0.0, 0.0])
    np.testing.assert_allclose(w, expect, rtol=1e-7, atol=1e-8)
    # learned model beats chance decisively on the training set
    Xb = np.hstack([np.ones((len(X), 1)), X])
    acc = (((1 / (1 + np.exp(-(Xb @ np.array(w))))) >= 0.5) == (y == 1)).mean()
    assert acc > 0.9


def test_empty_and_bad_init_raise(spark):
    df = spark.createDataFrame([], "x1 double, y double")
    with pytest.raises(ValueError, match="empty"):
        logreg_train(df, ["x1"], "y", iterations=1)
    df2 = spark.createDataFrame([(1.0, 1.0)], "x1 double, y double")
    with pytest.raises(ValueError, match="weights"):
        logreg_train(df2, ["x1"], "y", init=[0.0])


def test_divergence_guard(spark):
    df = spark.createDataFrame(
        [(1e6, 1.0), (-1e6, 0.0)], "x1 double, y double"
    )
    # absurd lr on huge features → non-finite weights → loud failure
    with pytest.raises(ValueError, match="diverged"):
        logreg_train(df, ["x1"], "y", lr=1e308, iterations=3)
