"""Holt double-exponential-smoothing recurrence: parity against a
pure-Python replay (the same bar the round-6b recurrences clear), plus
multi-key independence and argument guards."""

from __future__ import annotations

import pytest

from jibaro_spark.operators.sequential import holt


def _replay(xs, alpha, beta):
    out = []
    lev = tr = 0.0
    for i, x in enumerate(xs):
        if i == 0:
            lev, tr = float(x), 0.0
        else:
            prev = lev
            lev = alpha * x + (1.0 - alpha) * (lev + tr)
            tr = beta * (lev - prev) + (1.0 - beta) * tr
        out.append((lev, tr))
    return out


@pytest.mark.parametrize("alpha,beta", [(0.5, 0.25), (0.25, 0.5), (1.0, 0.0)])
def test_holt_matches_python_replay(spark, alpha, beta):
    xs = [10.0, 12.5, 9.0, 14.25, 14.25, 3.5, 20.0]
    rows = [("k", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["k", "i", "x"])
    got = {
        r["i"]: (r["level"], r["trend"])
        for r in holt(df, ["k"], ["i"], "x", alpha=alpha, beta=beta).collect()
    }
    want = _replay(xs, alpha, beta)
    for i, (lv, tr) in enumerate(want):
        assert got[i] == (lv, tr)  # bit-exact, not approx


def test_holt_keys_are_independent_and_single_row(spark):
    rows = [("a", 0, 5.0), ("a", 1, 7.0), ("b", 0, 100.0)]
    df = spark.createDataFrame(rows, ["k", "i", "x"])
    out = {(r["k"], r["i"]): (r["level"], r["trend"])
           for r in holt(df, ["k"], ["i"], "x").collect()}
    assert out[("b", 0)] == (100.0, 0.0)
    assert out[("a", 0)] == (5.0, 0.0)
    a1 = _replay([5.0, 7.0], 0.5, 0.25)[1]
    assert out[("a", 1)] == a1


def test_holt_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 0, 1.0)], ["k", "i", "x"])
    with pytest.raises(ValueError, match="alpha"):
        holt(df, ["k"], ["i"], "x", alpha=0.0)
    with pytest.raises(ValueError, match="key"):
        holt(df, [], ["i"], "x")
    with pytest.raises(ValueError, match="order_by"):
        holt(df, ["k"], [], "x")
