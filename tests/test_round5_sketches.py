"""Count-min sketch operator laws (VERDICT r4 §Next-7): mergeability
— sketch(A ∪ B) == merge(sketch(A), sketch(B)) cell-for-cell — plus
lookup guarantees over a merged sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.operators.sketches import (
    cms_estimates,
    cms_lookup,
    cms_merge,
    cms_sketch,
)

DEPTH, WIDTH = 4, 256


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def _cells(df):
    return {(r["row"], r["col"]): r["cnt"] for r in df.collect()}


def test_cms_merge_equals_sketch_of_union(spark):
    a_words = [f"w{i % 17}" for i in range(300)]
    b_words = [f"w{i % 23}" for i in range(400)] + ["only_b"] * 9
    a, b = _terms(spark, a_words), _terms(spark, b_words)
    union = _terms(spark, a_words + b_words)
    merged = _cells(cms_merge(cms_sketch(a, "term", DEPTH, WIDTH),
                              cms_sketch(b, "term", DEPTH, WIDTH)))
    direct = _cells(cms_sketch(union, "term", DEPTH, WIDTH))
    assert merged == direct


def test_cms_merge_three_way_and_lookup_bounds(spark):
    parts = [
        [f"t{i % 11}" for i in range(200)],
        [f"t{i % 7}" for i in range(150)],
        ["hot"] * 500 + [f"t{i}" for i in range(40)],
    ]
    sketches = [cms_sketch(_terms(spark, p), "term", DEPTH, WIDTH) for p in parts]
    merged = cms_merge(*sketches)
    all_words = [w for p in parts for w in p]
    exact: dict[str, int] = {}
    for w in all_words:
        exact[w] = exact.get(w, 0) + 1
    est = {
        r["term"]: r["est"]
        for r in cms_lookup(
            merged, _terms(spark, sorted(set(all_words))), "term", DEPTH, WIDTH
        ).collect()
    }
    n = len(all_words)
    for w, c in exact.items():
        assert est[w] >= c, f"{w}: CMS must never underestimate"
        assert est[w] <= c + (2.72 / WIDTH) * n * 4, f"{w}: overestimate bound"
    # the heavy hitter dominates estimates as it does truth
    assert max(est, key=est.get) == "hot"


def test_cms_lookup_absent_term_is_zero_or_collision(spark):
    data = _terms(spark, [f"x{i}" for i in range(50)])
    sketch = cms_sketch(data, "term", DEPTH, WIDTH)
    est = {
        r["term"]: r["est"]
        for r in cms_lookup(
            sketch, _terms(spark, ["never_seen_term"]), "term", DEPTH, WIDTH
        ).collect()
    }
    # absent term: estimate is >= 0 (0 unless all d cells collide)
    assert est["never_seen_term"] >= 0
    assert est["never_seen_term"] <= 50


def test_cms_estimates_matches_manual_composition(spark):
    words = [f"z{i % 5}" for i in range(60)]
    df = _terms(spark, words)
    via_op = {
        r["term"]: r["est"]
        for r in cms_estimates(df, "term", DEPTH, WIDTH).collect()
    }
    via_parts = {
        r["term"]: r["est"]
        for r in cms_lookup(
            cms_sketch(df, "term", DEPTH, WIDTH),
            df.dropDuplicates(["term"]),
            "term",
            DEPTH,
            WIDTH,
        ).collect()
    }
    assert via_op == via_parts
    assert all(v == 12 for v in via_op.values())  # 60/5, no collisions at width 256


def test_cms_sketch_bounded_size(spark):
    big = spark.range(20000).select(
        F.concat(F.lit("term_"), F.col("id") % 3000).alias("term")
    )
    sk = cms_sketch(big, "term", DEPTH, WIDTH)
    assert sk.count() <= DEPTH * WIDTH
    total = sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == 20000 for r in total)  # each hash row counts every item
