"""Round-30 family tests: Chapman recovery accuracy, index-number
bracket laws (Fisher between L and P), burstiness bounds.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_capture_recapture_recovers_universe(spark):
    r = REGISTRY["q_capture_recapture"].fn(spark, SF).collect()[0]
    assert r["nab"] <= min(r["na"], r["nb"])
    # with ~30% capture rates on hundreds of units, Chapman should be
    # within ~25% of the truth
    assert 0.75 <= r["estimate_ratio"] <= 1.25


def test_fisher_between_laspeyres_paasche(spark):
    r = REGISTRY["q_laspeyres_paasche"].fn(spark, SF).collect()[0]
    assert r["n_parts"] > 0
    lo, hi = sorted((r["laspeyres"], r["paasche"]))
    assert lo - 1e-9 <= r["fisher"] <= hi + 1e-9  # geometric mean bracket
    assert r["laspeyres"] > 0 and r["paasche"] > 0


def test_burstiness_bounds(spark):
    rows = REGISTRY["q_term_burstiness"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["df"] <= r["tf"]
        assert r["poisson_df"] > 0
        # df can never exceed the doc universe; burstiness <= ~1/(1-e^-1)
        assert 0 < r["burstiness"] <= 1.6
