"""Round-33 family tests: metric-space laws for diameter/radius and
percolation monotonicity.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_diameter_metric_laws(spark):
    rows = REGISTRY["q_graph_diameter"].fn(spark, SF).collect()
    assert rows
    d = rows[0]["diameter"]
    r = rows[0]["radius"]
    eff = rows[0]["effective_diameter"]
    # metric-space laws: radius <= diameter <= 2*radius (connected)
    assert r <= d <= 2 * r
    assert 1 <= eff <= d
    for row in rows:
        assert r <= row["eccentricity"] <= d


def test_percolation_monotone(spark):
    rows = sorted(
        REGISTRY["q_percolation_thresholds"].fn(spark, SF).collect(),
        key=lambda r: r["tau"],
    )
    assert [r["tau"] for r in rows] == [3, 6, 9]
    comps = [r["n_components"] for r in rows]
    giants = [r["giant_share"] for r in rows]
    # more edges → fewer (or equal) components, bigger (or equal) giant
    assert comps == sorted(comps, reverse=True)
    assert giants == sorted(giants)
    for r in rows:
        assert 0 < r["giant_share"] <= 1.0
