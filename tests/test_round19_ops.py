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


def _hw_ref(xs, m=7, a=0.5, b=0.25, g=0.25):
    seas = [0.0] * m
    lev, tr = 0.0, 0.0
    out = []
    for i, x in enumerate(xs):
        if i == 0:
            lev, tr, s_new = x, 0.0, 0.0
        else:
            su = seas[0]
            l_new = a * (x - su) + (1 - a) * (lev + tr)
            tr = b * (l_new - lev) + (1 - b) * tr
            s_new = g * (x - l_new) + (1 - g) * su
            lev = l_new
        seas = seas[1:] + [s_new]
        out.append((lev, tr, s_new))
    return out


def test_holt_winters_matches_pure_python(spark):
    xs = [10.0, 12.0, 8.0, 11.0, 15.0, 9.0, 7.0, 13.0, 12.5, 8.25,
          11.75, 14.0, 9.5, 7.25, 12.0]
    rows = [("k", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    from jibaro_spark.operators.sequential import holt_winters

    got = (
        holt_winters(df, ["k"], ["t"], "x", period=7)
        .orderBy("t")
        .collect()
    )
    want = _hw_ref(xs)
    for r, (lev, tr, s) in zip(got, want):
        assert r["level"] == lev and r["trend"] == tr and r["s_cur"] == s


def test_holt_winters_tracks_pure_seasonal_signal(spark):
    # a noiseless period-7 signal: after warmup the one-step forecast
    # level+trend+seas-slot should approach the signal
    base = [5.0, 1.0, 2.0, 8.0, 3.0, 9.0, 4.0]
    xs = base * 8
    rows = [("k", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    from jibaro_spark.operators.sequential import holt_winters

    got = holt_winters(df, ["k"], ["t"], "x", period=7).orderBy("t").collect()
    tail = got[-7:]
    for r, x in zip(tail, base):
        # level + seasonal reconstructs the signal within tolerance
        assert abs((r["level"] + r["s_cur"]) - x) < 1.5
