"""Round-17 family tests: BH step-up laws (monotone rejection set,
threshold formula, p-value range), Jensen-Shannon bounds + symmetry,
Cramér's V range and chi2/dof consistency, and Brier/reliability bin
invariants.
"""

from __future__ import annotations

import math

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bh_stepup_laws(spark):
    rows = REGISTRY["q_benjamini_hochberg"].fn(spark, SF).collect()
    assert rows
    m = len(rows)
    by_rank = sorted(rows, key=lambda r: r["rank"])
    # ranks are 1..m, p ascending along rank
    assert [r["rank"] for r in by_rank] == list(range(1, m + 1))
    ps = [r["p_value"] for r in by_rank]
    assert ps == sorted(ps)
    for r in by_rank:
        assert 0.0 <= r["p_value"] <= 1.0
        assert abs(r["bh_threshold"] - round(0.10 * r["rank"] / m, 10)) < 1e-12
    # the rejection set is a prefix of the p-ordering (step-up law)
    rejected = [r["rejected"] for r in by_rank]
    if any(rejected):
        k = max(i for i, x in enumerate(rejected) if x)
        assert all(rejected[: k + 1])
        assert not any(rejected[k + 1 :])
        # the boundary hypothesis itself satisfies p_k <= k*alpha/m
        assert by_rank[k]["p_value"] <= by_rank[k]["bh_threshold"]


def test_jensen_shannon_bounds_and_symmetry(spark, sf_dir):
    r = REGISTRY["q_jensen_shannon"].fn(spark, SF).collect()[0]
    # JSD in nats is bounded by ln 2; components are non-negative
    assert 0.0 <= r["jsd"] <= math.log(2.0) + 1e-9
    assert r["kl_p_m"] >= 0.0 and r["kl_q_m"] >= 0.0
    assert abs(r["jsd"] - round((r["kl_p_m"] + r["kl_q_m"]) / 2.0, 6)) < 1e-5
    assert r["n_bands"] > 0


def test_cramers_v_range(spark):
    r = REGISTRY["q_cramers_v"].fn(spark, SF).collect()[0]
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0
    assert r["dof"] >= 1
    assert r["n"] > 0


def test_brier_calibration_invariants(spark):
    rows = REGISTRY["q_brier_calibration"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["cal_bin"] <= 9
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert 0.0 <= r["obs_rate"] <= 1.0
        # bin-level Brier is bounded by 1 and >= (mean_pred-obs_rate)^2
        # (calibration-refinement decomposition lower bound)
        assert 0.0 <= r["brier"] <= 1.0
        assert r["brier"] >= (r["mean_pred"] - r["obs_rate"]) ** 2 - 1e-6
        # the bin's mean prediction lies inside the bin's nominal range
        assert r["cal_bin"] / 10.0 - 1e-9 <= r["mean_pred"]
        assert r["mean_pred"] <= (r["cal_bin"] + 1) / 10.0 + 1e-9 or r["cal_bin"] == 9
