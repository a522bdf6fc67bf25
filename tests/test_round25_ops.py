"""Round-25 family tests: grid-DBSCAN cluster laws, quadrat dispersion
consistency, and second-digit Benford distribution laws.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_grid_dbscan_cluster_laws(spark):
    rows = REGISTRY["q_grid_dbscan"].fn(spark, SF).collect()
    for r in rows:
        assert r["n_cells"] >= 2
        assert r["n_points"] >= r["n_cells"]  # core cells are above-mean
    ids = [r["cluster_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_quadrat_consistency(spark):
    r = REGISTRY["q_quadrat_csr"].fn(spark, SF).collect()[0]
    assert r["n_quadrats"] > 1
    assert r["mean_count"] >= 1.0  # occupied cells only
    assert r["dispersion_index"] >= 0.0
    assert abs(r["chi2"] - r["dispersion_index"] * (r["n_quadrats"] - 1)) < 0.01


def test_benford_second_digit_laws(spark):
    rows = REGISTRY["q_benford_second_digit"].fn(spark, SF).collect()
    assert len(rows) == 10
    tot_obs = sum(r["observed_p"] for r in rows)
    tot_exp = sum(r["benford_p"] for r in rows)
    assert abs(tot_obs - 1.0) < 1e-3
    assert abs(tot_exp - 1.0) < 1e-3
    # second-digit expectation is much flatter than first-digit but
    # still monotone decreasing in k
    ps = [r["benford_p"] for r in sorted(rows, key=lambda r: r["digit"])]
    assert ps == sorted(ps, reverse=True)
