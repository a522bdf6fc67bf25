"""Round-23 family tests: partial-correlation ranges, alpha/ICC
bounds, Chao1 ≥ V law, Simpson range, reciprocity set laws.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_partial_correlation_ranges(spark):
    rows = REGISTRY["q_partial_correlation"].fn(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        assert -1.0 - 1e-9 <= r["partial_corr"] <= 1.0 + 1e-9


def test_cronbach_alpha_bound(spark):
    r = REGISTRY["q_cronbach_alpha"].fn(spark, SF).collect()[0]
    # alpha <= 1 always; can be negative for unrelated items (the
    # fixture's measures are near-independent)
    assert r["alpha"] <= 1.0 + 1e-9
    assert r["k"] == 4


def test_icc_bounds(spark):
    r = REGISTRY["q_icc_anova"].fn(spark, SF).collect()[0]
    # ICC(1,1) lies in [-1/(k0-1), 1]
    assert r["icc"] <= 1.0 + 1e-9
    assert r["icc"] >= -1.0 / (r["k0"] - 1) - 1e-6
    assert r["n_groups"] >= 2


def test_chao1_dominates_observed_vocab(spark):
    r = REGISTRY["q_chao1_good_turing"].fn(spark, SF).collect()[0]
    assert r["chao1"] >= r["v"]
    assert 0.0 <= r["missing_mass"] <= 1.0
    assert r["f1"] + 2 * r["f2"] <= r["n_tokens"]


def test_simpson_range(spark):
    rows = REGISTRY["q_simpson_diversity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["simpson_d"] <= 1.0
        assert r["n_tokens"] > 1


def test_reciprocity_set_laws(spark):
    r = REGISTRY["q_graph_reciprocity"].fn(spark, SF).collect()[0]
    assert r["n_directed"] == r["n_edges"] - r["n_self"]
    assert 0 <= r["n_reciprocated"] <= r["n_directed"]
    # reciprocated edges come in pairs
    assert r["n_reciprocated"] % 2 == 0
    assert 0.0 <= r["reciprocity"] <= 1.0
