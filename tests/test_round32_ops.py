"""Round-32 family tests: bottom-k determinism and Friedman/Kendall-W
consistency identity.
"""

from __future__ import annotations

import hashlib

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bottomk_priorities_are_md5(spark):
    rows = REGISTRY["q_bottomk_sample"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["priority"] == hashlib.md5(r["user_id"].encode()).hexdigest()
        assert 1 <= r["rank"] <= 16


def test_friedman_kendall_identity(spark):
    f = REGISTRY["q_friedman_test"].fn(spark, SF).collect()[0]
    w = REGISTRY["q_kendall_w"].fn(spark, SF).collect()[0]
    # chi2_F = m(n-1)W holds when both run over the same complete
    # design; the W query uses all nations, so only check when the
    # designs coincide (every nation present every year)
    if f["n_nations"] == w["n_nations"]:
        m, n = f["n_years"], f["n_nations"]
        assert abs(f["friedman_chi2"] - m * (n - 1) * w["kendall_w"]) < 0.01
    assert f["friedman_chi2"] >= 0.0
