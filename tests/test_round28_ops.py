"""Round-28 family tests: Shapley efficiency axiom, Oaxaca gap
additivity, and confusion-metric identities.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency(spark):
    r = REGISTRY["q_shapley_r2"].fn(spark, SF).collect()[0]
    # efficiency: attributions sum to the full R²
    assert abs(r["shapley_qty"] + r["shapley_discount"] - r["r2_full"]) < 1e-5
    assert 0.0 <= r["r2_full"] <= 1.0


def test_oaxaca_additivity(spark):
    r = REGISTRY["q_oaxaca_gap"].fn(spark, SF).collect()[0]
    assert abs(r["explained"] + r["unexplained"] - r["total_gap"]) < 1e-5


def test_confusion_identities(spark):
    r = REGISTRY["q_confusion_metrics"].fn(spark, SF).collect()[0]
    tp, fp, fn, tn = r["tp"], r["fp"], r["fn"], r["tn"]
    assert tp + fp + fn + tn > 0
    assert abs(r["precision"] - round(tp / (tp + fp), 6)) < 1e-9
    assert abs(r["recall"] - round(tp / (tp + fn), 6)) < 1e-9
    # F1 is the harmonic mean of P and R
    p, q = r["precision"], r["recall"]
    assert abs(r["f1"] - 2 * p * q / (p + q)) < 1e-4
    assert -1.0 <= r["mcc"] <= 1.0
    assert 0.0 <= r["balanced_accuracy"] <= 1.0
