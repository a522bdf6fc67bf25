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


def _pav(bins, ns, ss):
    """Pure-Python weighted pool-adjacent-violators (Barlow et al.):
    the ground truth the minimax-identity operator must reproduce."""
    # stack of (weight, mean) pools, bins assumed sorted
    pools = []  # (w, total, members)
    for b, n, s in zip(bins, ns, ss):
        pools.append([n, s, [b]])
        while len(pools) >= 2 and (
            pools[-2][1] / pools[-2][0] >= pools[-1][1] / pools[-1][0]
        ):
            w2, t2, m2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += t2
            pools[-1][2].extend(m2)
    out = {}
    for w, t, members in pools:
        for b in members:
            out[b] = t / w
    return out


def test_isotonic_minimax_equals_pav(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.training import isotonic_fit_binned

    # adversarial cell pattern: strict violations, plateaus, a spike
    data = [
        ("g", 1, 4, 2),
        ("g", 2, 3, 3),
        ("g", 3, 5, 1),
        ("g", 4, 2, 2),
        ("g", 5, 6, 0),
        ("g", 6, 1, 1),
        ("h", 1, 5, 5),
        ("h", 2, 5, 0),
        ("h", 3, 5, 5),
    ]
    df = spark.createDataFrame(data, ["grp", "bin", "n", "s"])
    got = {
        (r["grp"], r["bin"]): r["iso_fit"]
        for r in isotonic_fit_binned(df, ["grp"], "bin", "n", "s").collect()
    }
    for grp in ("g", "h"):
        rows = sorted((b, n, s) for g2, b, n, s in data if g2 == grp)
        want = _pav([r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows])
        for b, v in want.items():
            assert abs(got[(grp, b)] - v) < 1e-12, (grp, b, got[(grp, b)], v)
    # monotone non-decreasing within each group
    for grp in ("g", "h"):
        fits = [v for (g2, _), v in sorted(got.items()) if g2 == grp]
        assert fits == sorted(fits)


def test_isotonic_calibration_monotone(spark):
    rows = REGISTRY["q_isotonic_calibration"].fn(spark, SF).collect()
    assert rows
    by_ls = {}
    for r in rows:
        by_ls.setdefault(r["linestatus"], []).append((r["bin"], r["iso_rate"]))
    for ls, pts in by_ls.items():
        pts.sort()
        fits = [p[1] for p in pts]
        assert fits == sorted(fits), ls
        assert all(0.0 <= f <= 1.0 for f in fits)


def test_silhouette_range(spark):
    rows = REGISTRY["q_silhouette_simplified"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert r["n"] > 0
