"""Round-26 family tests: Gumbel moment identities, DFT weekly-peak
dominance sanity, negative-binomial moment laws.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_gumbel_identities(spark):
    r = REGISTRY["q_gumbel_fit"].fn(spark, SF).collect()[0]
    assert r["n_blocks"] > 3
    assert r["beta"] > 0
    # mu < mean (Euler shift) and the p99 return level dominates both
    assert r["mu"] < r["block_mean"]
    assert r["return_level_p99"] > r["block_mean"]


def test_dft_amplitudes(spark):
    rows = REGISTRY["q_dft_weekly_power"].fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["amplitude"] >= 0.0
    periods = {r["period"] for r in rows}
    assert periods == {7, 11, 13}


def test_negbin_moment_laws(spark):
    rows = REGISTRY["q_negbin_fit"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["mean_count"] > 0 and r["var_count"] >= 0
        if r["overdispersed"]:
            assert r["nb_r"] > 0 and 0 < r["nb_p"] < 1
            # MoM identity: m = r(1-p)/p within rounding
            m_back = r["nb_r"] * (1 - r["nb_p"]) / r["nb_p"]
            assert abs(m_back - r["mean_count"]) / r["mean_count"] < 0.01
        else:
            assert r["nb_r"] is None and r["nb_p"] is None
