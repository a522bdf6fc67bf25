"""Round-31 family tests: lift-table mass laws and Kendall-W range."""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_decile_lift_laws(spark):
    rows = REGISTRY["q_decile_lift"].fn(spark, SF).collect()
    assert rows
    by_dec = sorted(rows, key=lambda r: r["decile"])
    # cumulative capture is non-decreasing and ends at 1
    caps = [r["cum_capture"] for r in by_dec]
    assert caps == sorted(caps)
    assert abs(caps[-1] - 1.0) < 1e-6
    # weighted lift averages to ~1 over the whole population
    tot_n = sum(r["n"] for r in rows)
    wavg = sum(r["lift"] * r["n"] for r in rows) / tot_n
    assert abs(wavg - 1.0) < 0.02
    # every decile's lift stays positive and bounded by 1/base-rate
    assert all(r["lift"] > 0 for r in rows)


def test_kendall_w_range(spark):
    r = REGISTRY["q_kendall_w"].fn(spark, SF).collect()[0]
    assert 0.0 <= r["kendall_w"] <= 1.0
    assert r["n_years"] >= 2
    assert r["n_nations"] >= 2


def test_youden_threshold_laws(spark):
    rows = REGISTRY["q_youden_threshold"].fn(spark, SF).collect()
    assert rows
    by_thr = sorted(rows, key=lambda r: -r["threshold"])
    tprs = [r["tpr"] for r in by_thr]
    fprs = [r["fpr"] for r in by_thr]
    # both rates are monotone non-decreasing as the threshold drops
    assert tprs == sorted(tprs)
    assert fprs == sorted(fprs)
    # the loosest threshold accepts everything
    assert abs(tprs[-1] - 1.0) < 1e-9 and abs(fprs[-1] - 1.0) < 1e-9
    for r in rows:
        # J is rounded from the UNROUNDED rates; recomputing from the
        # displayed (rounded) rates can differ by one ulp-of-1e-6
        assert abs(r["youden_j"] - (r["tpr"] - r["fpr"])) < 2e-6
        assert r["exp_cost_5to1"] >= 0
