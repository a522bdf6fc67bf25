"""Round-19 family tests: DTW DP pinned exactly against a pure-Python
reference (the non-SQL-expressible row's correctness anchor), DTW
metric laws on the fixture, Tukey-Kramer consistency with ANOVA
moments, and Brown-Forsythe non-negativity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.operators.sequential import dtw_distance_pairs
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _dtw_ref(x, y, band):
    """Textbook banded DTW, plain Python floats."""
    n, m = len(x), len(y)
    w = max(band, abs(n - m))
    big = float("inf")
    prev = [big] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [big] * (m + 1)
        for j in range(max(1, i - w), min(m, i + w) + 1):
            c = abs(x[i - 1] - y[j - 1])
            cur[j] = c + min(prev[j - 1], prev[j], cur[j - 1])
        prev = cur
    return prev[m]


def test_dtw_matches_pure_python(spark):
    series = {
        "a": [1.0, 2.0, 3.0, 2.0, 1.0, 5.0, 4.0],
        "b": [1.0, 1.0, 2.0, 3.0, 2.0, 1.0, 5.0],  # a shifted by one
        "c": [9.0, 9.0, 9.0],                       # short + far
    }
    rows = [
        (k, t, v) for k, vs in series.items() for t, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = {
        (r["key_a"], r["key_b"]): r["dtw"]
        for r in dtw_distance_pairs(df, "k", "t", "v", band=2).collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ka, kb), d in got.items():
        want = _dtw_ref(series[ka], series[kb], band=2)
        assert abs(d - want) < 1e-12, (ka, kb, d, want)
    # the shifted twin is closer than the constant outlier
    assert got[("a", "b")] < got[("a", "c")]


def test_dtw_identical_series_zero(spark):
    rows = [(k, t, float(t % 5)) for k in ("x", "y") for t in range(20)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    got = dtw_distance_pairs(df, "k", "t", "v", band=3).collect()
    assert len(got) == 1 and got[0]["dtw"] == 0.0


def test_dtw_query_integer_distances(spark):
    rows = REGISTRY["q_dtw_priority_pairs"].fn(spark, SF).collect()
    assert len(rows) == 10  # C(5,2) priority pairs
    for r in rows:
        assert r["dtw"] >= 0.0
        # integer series → exactly integer distances
        assert r["dtw"] == round(r["dtw"])
        assert r["key_a"] < r["key_b"]


def test_tukey_kramer_consistency(spark):
    rows = REGISTRY["q_tukey_kramer"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    qs = [r["q_stat"] for r in rows]
    assert qs == sorted(qs, reverse=True)
    for r in rows:
        assert r["q_stat"] >= 0.0
        assert r["significant"] == (r["q_stat"] > 3.633)
        assert r["nation_a"] < r["nation_b"]


def test_brown_forsythe_nonnegative(spark):
    r = REGISTRY["q_brown_forsythe"].fn(spark, SF).collect()[0]
    assert r["bf_stat"] >= 0.0
    assert r["n_groups"] >= 2
    assert r["n_rows"] > r["n_groups"]
