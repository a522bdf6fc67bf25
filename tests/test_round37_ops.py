"""Round-37 family tests: seasonal-strength range and demand-class
partition laws.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_seasonal_strength_range(spark):
    r = REGISTRY["q_seasonal_strength"].fn(spark, SF).collect()[0]
    assert 0.0 <= r["seasonal_strength"] <= 1.0
    assert r["n_days"] > 7


def test_demand_classes_partition(spark):
    rows = REGISTRY["q_demand_classification"].fn(spark, SF).collect()
    assert rows
    classes = {r["demand_class"] for r in rows}
    assert classes <= {"smooth", "intermittent", "erratic", "lumpy"}
    for r in rows:
        assert r["n_products"] > 0
        assert r["mean_adi"] >= 1.0  # ADI is at least one day
        assert r["mean_cv2"] >= 0.0
        if r["demand_class"] in ("smooth", "erratic"):
            assert r["mean_adi"] < 1.32
        if r["demand_class"] in ("smooth", "intermittent"):
            assert r["mean_cv2"] < 0.49
