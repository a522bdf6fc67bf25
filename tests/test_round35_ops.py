"""Round-35 family tests: capability index ordering and control-limit
geometry.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_capability_index_ordering(spark):
    rows = REGISTRY["q_process_capability"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # Cpk <= Cp always (centering can only hurt)
        assert r["cpk"] <= r["cp"] + 1e-9
        assert r["sd_qty"] > 0
        assert 1.0 <= r["mean_qty"] <= 50.0


def test_control_limit_geometry(spark):
    r = REGISTRY["q_xbar_r_chart"].fn(spark, SF).collect()[0]
    assert r["lcl_x"] < r["xbar_bar"] < r["ucl_x"]
    assert r["ucl_r"] > r["r_bar"] > 0
    assert r["n_subgroups"] >= 5
    assert 0 <= r["n_out_of_control_x"] <= r["n_subgroups"]
    assert 0 <= r["n_out_of_control_r"] <= r["n_subgroups"]
