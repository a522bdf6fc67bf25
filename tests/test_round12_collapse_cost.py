"""Round-12 guards for the COST-BASED exact-collapse decision.

Round 11 made the collapse adaptive on duplicate EXISTENCE; round 12
makes it adaptive on duplicate COST: the members machinery only pays
when duplicate volume is material (> ``_COLLAPSE_DUP_ROW_FRAC`` of
rows are non-representative copies) or a single cluster is big enough
to risk a quadratic bucket (> ``_COLLAPSE_MAX_CLUSTER``).  A corpus
with a handful of small dup clusters now takes the UNCOLLAPSED
pipeline, which finds and scores the exact-dup pairs itself.

Pinned here:

* regime routing under the cost thresholds (immaterial dups → bypass;
  material volume → collapse; one oversized cluster → collapse; ≥2
  NULL texts → collapse, the unchanged r11 routing);
* bit-identical operator output across the two regimes ON A
  DUP-BEARING CORPUS — the r11 guard only pinned equality on
  duplicate-free corpora, where the bypass is trivially the identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import jibaro_spark.operators.dedup as dd


@pytest.fixture(scope="module")
def small_dup_corpus(spark):
    """24 docs, one 2-copy cluster: dup_rows/n = 1/24 ≈ 4% < 10% and
    max cluster 2 ≪ 256 → cost decision says bypass."""
    rows = [
        (i, f"document number {i} talks about topic {i % 7} in detail "
            f"with some shared vocabulary and some unique token t{i}")
        for i in range(1, 24)
    ]
    rows.append((101, rows[0][1]))  # exact copy of doc 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cost_routing(spark, small_dup_corpus):
    # immaterial dups: bypass despite duplicates existing
    reps, members = dd._exact_text_collapse(small_dup_corpus, "doc_id", "text")
    assert members is None
    assert reps is small_dup_corpus

    # material volume: every doc duplicated once (dup_rows/n = 50%)
    doubled = small_dup_corpus.unionByName(
        small_dup_corpus.withColumn("doc_id", F.col("doc_id") + 1000)
    )
    _, members2 = dd._exact_text_collapse(doubled, "doc_id", "text")
    assert members2 is not None

    # one oversized cluster trips the quadratic guard even at low
    # overall volume (force with a tiny threshold)
    try:
        old = dd._COLLAPSE_MAX_CLUSTER
        dd._COLLAPSE_MAX_CLUSTER = 1
        _, members3 = dd._exact_text_collapse(
            small_dup_corpus, "doc_id", "text"
        )
        assert members3 is not None
    finally:
        dd._COLLAPSE_MAX_CLUSTER = old


def test_multi_null_texts_still_route_collapsed(spark):
    # ≥2 NULL texts keep the r11 routing (collapsed), which is what
    # pins "NULL texts never pair"; and they never count toward the
    # cost thresholds
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    _, members = dd._exact_text_collapse(df, "doc_id", "text")
    assert members is not None
    pairs = dd.minhash_near_duplicates(
        df, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3,
        jaccard_threshold=0.5,
    ).collect()
    assert pairs == []


def _pair_sets(df_pairs, score_col):
    extra = [c for c in df_pairs.columns if c not in ("id_a", "id_b", score_col)]
    return {
        (r.id_a, r.id_b, round(float(r[score_col]), 9),
         tuple(r[c] for c in extra))
        for r in df_pairs.collect()
    }


@pytest.mark.parametrize(
    "op,kwargs,score",
    [
        ("minhash_near_duplicates",
         dict(num_hashes=16, bands=4, shingle_n=3, jaccard_threshold=0.3),
         "est_jaccard"),
        ("simhash_near_duplicates",
         dict(max_hamming=10, shingle_n=2), "hamming"),
        ("ngram_jaccard_pairs",
         dict(shingle_n=3, threshold=0.3), "jaccard"),
        ("ngram_containment_pairs",
         dict(shingle_n=3, threshold=0.3), "containment"),
    ],
)
def test_bypass_equals_collapse_on_dup_corpus(
    spark, small_dup_corpus, op, kwargs, score
):
    """THE r12 invariant: on the same dup-bearing corpus, the bypass
    regime (cost decision) and the force-collapsed regime produce
    bit-identical pair sets — including the exact-dup pair (1, 101)
    at the exact-duplicate score, which the bypass pipeline must find
    through the ordinary candidate machinery."""
    fn = getattr(dd, op)
    bypass = _pair_sets(fn(small_dup_corpus, "doc_id", "text", **kwargs), score)
    try:
        old = dd._COLLAPSE_DUP_ROW_FRAC
        dd._COLLAPSE_DUP_ROW_FRAC = -1.0  # force the collapsed path
        collapsed = _pair_sets(
            fn(small_dup_corpus, "doc_id", "text", **kwargs), score
        )
    finally:
        dd._COLLAPSE_DUP_ROW_FRAC = old
    assert bypass == collapsed
    exact_score = 0.0 if score == "hamming" else 1.0
    assert any(p[0] == 1 and p[1] == 101 and p[2] == exact_score
               for p in bypass)
