"""Round-29 family tests: ABC-XYZ partition laws and safety-stock
formula identities.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_abc_xyz_partition_laws(spark):
    rows = REGISTRY["q_abc_xyz"].fn(spark, SF).collect()
    assert rows
    share = sum(r["revenue_share"] for r in rows)
    assert abs(share - 1.0) < 1e-3  # classes partition the revenue
    by_abc = {}
    for r in rows:
        assert r["abc"] in "ABC" and r["xyz"] in "XYZ"
        by_abc.setdefault(r["abc"], 0)
        by_abc[r["abc"]] += r["revenue_share"]
    # A is the head of the Pareto: it must carry the largest share
    if "A" in by_abc and "C" in by_abc:
        assert by_abc["A"] > by_abc["C"]


def test_safety_stock_identities(spark):
    rows = REGISTRY["q_safety_stock"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["sigma_daily"] >= 0
        assert abs(
            r["safety_stock"] - round(1.645 * r["sigma_daily"] * 7 ** 0.5, 4)
        ) < 0.01
        assert r["reorder_point"] >= r["safety_stock"]
