"""Round-24 family tests: VaR/CVaR dominance, elasticity sign
stability, RMST bounds, Weibull parameter sanity, LTV monotonicity.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_var_cvar_dominance(spark):
    rows = REGISTRY["q_var_cvar"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # expected shortfall is at least the VaR threshold
        assert r["cvar_95"] >= r["var_95"] - 1e-9
        assert r["n_tail"] >= 1


def test_elasticity_defined(spark):
    rows = REGISTRY["q_price_elasticity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n"] > 10
        assert abs(r["elasticity"]) < 10  # sane magnitude


def test_rmst_bounds(spark):
    r = REGISTRY["q_rmst"].fn(spark, SF).collect()[0]
    assert 0.0 < r["rmst_hours"] <= 72.0
    assert r["tau_hours"] == 72


def test_weibull_parameters_sane(spark):
    r = REGISTRY["q_weibull_fit"].fn(spark, SF).collect()[0]
    assert r["n_points"] > 5
    assert 0.0 < r["shape_k"] < 10.0
    assert 0.0 < r["scale_lambda"] < 1000.0


def test_ltv_monotone_per_cohort(spark):
    rows = REGISTRY["q_cohort_ltv"].fn(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(
            (r["week_offset"], r["ltv_per_user"])
        )
    for cw, pts in by_cohort.items():
        pts.sort()
        vals = [v for _, v in pts]
        assert vals == sorted(vals), cw  # cumulative → non-decreasing
        assert all(v >= 0 for v in vals)
