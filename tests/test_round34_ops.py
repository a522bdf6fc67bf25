"""Round-34 family tests: contamination-matrix symmetry/bounds."""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_contamination_matrix_laws(spark):
    rows = REGISTRY["q_contamination_matrix"].fn(spark, SF).collect()
    assert len(rows) == 6
    by_pair = {(r["split_a"], r["split_b"]): r for r in rows}
    # shared counts are symmetric; containments need not be
    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        assert by_pair[(a, b)]["n_shared"] == by_pair[(b, a)]["n_shared"]
    for r in rows:
        assert 0.0 <= r["containment"] <= 1.0
        assert r["n_shared"] >= 0
    # the small splits are more contained in train than vice versa
    assert (
        by_pair[("val", "train")]["containment"]
        >= by_pair[("train", "val")]["containment"]
    )
