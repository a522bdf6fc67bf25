"""Round-10 guards for the skew-probe rewrites.

The sf0.1 adversarial-skew probe rewrote four surfaces (SCALE.md r10):
the as-of join (union-scan), multi-touch attribution (boundary
probes), and the similarity-pair family (exact-collapse-first).  The
skew harness proves hash-equality against the oracles; these tests pin
the SEMANTICS on hand-built fixtures — direction/tie/NULL behavior for
the as-of join (which previously had no unit coverage at all), exact
credits for attribution, and the duplicate-cluster pair contract for
the collapsed operators.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


def _ts(day: int) -> datetime:
    return datetime(2024, 1, 1, 12, 0, 0) + timedelta(days=day - 1)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10)),
            (2, "u1", _ts(20)),
            (3, "u2", _ts(5)),
            (4, "u1", None),  # NULL time: matches nothing
            (5, None, _ts(30)),  # NULL key: matches nothing
        ],
        "pid long, user string, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, "u1", _ts(10)),  # tie on time with pid 1 and with cid 102
            (102, "u1", _ts(10)),
            (103, "u1", _ts(15)),
            (104, "u2", _ts(50)),
            (105, "u1", None),  # NULL time: never matches
            (106, None, _ts(1)),  # NULL key: never matches
        ],
        "cid long, r_user string, rt timestamp",
    )
    return left, right


def _asof(left, right, direction, how="inner"):
    from jibaro_spark.operators.relational import asof_join

    out = asof_join(
        left,
        right,
        left_on="user",
        right_on="r_user",
        left_time="lt",
        right_time="rt",
        right_tiebreak="cid",
        how=how,
        direction=direction,
    )
    return {r.pid: r.cid for r in out.collect()}


def test_asof_backward_semantics(spark, asof_frames):
    left, right = asof_frames
    # latest rt <= lt; equal rt tie -> MAX tiebreak (102 over 101)
    assert _asof(left, right, "backward") == {1: 102, 2: 103}


def test_asof_forward_semantics(spark, asof_frames):
    left, right = asof_frames
    # earliest rt >= lt; equal rt tie -> MIN tiebreak (101 over 102)
    assert _asof(left, right, "forward") == {1: 101, 3: 104}


def test_asof_nearest_semantics(spark, asof_frames):
    left, right = asof_frames
    # min |rt-lt|; gap tie -> earlier right, then MIN tiebreak
    assert _asof(left, right, "nearest") == {1: 101, 2: 103, 3: 104}


def test_asof_left_how_keeps_unmatched(spark, asof_frames):
    left, right = asof_frames
    rows = _asof(left, right, "backward", how="left")
    # every left row survives; unmatched ones carry NULL right columns
    assert set(rows) == {1, 2, 3, 4, 5}
    assert rows[3] is None and rows[4] is None and rows[5] is None


def test_attribution_credit_boundary_probes(spark, tmp_path):
    """Exact credits on a hand-built event log, through the registered
    query (boundary-probe formulation): purchase p1 has touches
    {c1, c2, v1} (first = click, last = view), p2's 7-day window is
    empty (vanishes, pair semantics), p3 has one view."""
    events = spark.createDataFrame(
        [
            (1, _ts(1), 1, "click", 1.0, None),
            (2, _ts(2), 1, "click", 1.0, None),
            (3, _ts(3), 1, "view", 1.0, None),
            (4, _ts(4), 1, "purchase", 1.0, None),
            (5, _ts(20), 1, "purchase", 1.0, None),
            (6, _ts(5), 2, "view", 1.0, None),
            (7, _ts(6), 2, "purchase", 1.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    fx = str(tmp_path / "fx")
    events.coalesce(1).write.parquet(f"{fx}/events.parquet")
    from jibaro_spark.queries import REGISTRY

    rows = {
        r.channel: r
        for r in REGISTRY["q_attribution_credit"].fn(spark, fx).collect()
    }
    assert set(rows) == {"click", "view"}
    c, v = rows["click"], rows["view"]
    assert (c.n_touches, c.first_touch, c.last_touch) == (2, 1, 0)
    assert c.linear_credit == pytest.approx(0.6667, abs=1e-4)
    assert (v.n_touches, v.first_touch, v.last_touch) == (2, 1, 2)
    assert v.linear_credit == pytest.approx(1.3333, abs=1e-4)


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """Five copies of one text (one with whitespace variance, collapsed
    by normalization), two distinct texts, a NULL and an empty text."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base),
            (4, "  " + base.upper() + "  "),  # normalizes to the same text
            (5, base + " with a different tail entirely here"),
            (6, "completely unrelated text about spark shuffles and parquet"),
            (7, None),
            (8, ""),
            (9, ""),
        ],
        "doc_id long, text string",
    )


def test_collapsed_minhash_pairs_cover_dup_cluster(spark, dup_corpus):
    from jibaro_spark.operators.dedup import minhash_near_duplicates

    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_near_duplicates(
            dup_corpus.filter(F.col("text").isNotNull()),
            "doc_id", "text", num_hashes=16, bands=4, shingle_n=3,
            jaccard_threshold=0.5,
        ).collect()
    }
    # all 6 pairs of the 4-copy cluster (1,2,3,4) at exactly 1.0
    for a in (1, 2, 3):
        for b in range(a + 1, 5):
            assert pairs[(a, b)] == 1.0
    # the two empty texts are identical too (naive semantics: [""]
    # shingle sets match)
    assert pairs[(8, 9)] == 1.0
    # NULL text never pairs
    assert not any(7 in p for p in pairs)


def test_collapsed_jaccard_and_containment_dup_cluster(spark, dup_corpus):
    from jibaro_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    docs = dup_corpus.filter(F.col("text").isNotNull())
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.3
        ).collect()
    }
    for a in (1, 2, 3):
        for b in range(a + 1, 5):
            assert jac[(a, b)] == 1.0
    assert jac[(8, 9)] == 1.0
    assert not any(7 in p for p in jac)
    con = {
        (r.id_a, r.id_b): (r.containment, r.n_grams_a)
        for r in ngram_containment_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.5
        ).collect()
    }
    # directed: both orientations inside the cluster, containment 1.0,
    # n_grams_a = the cluster text's distinct shingle count (10 words
    # -> 10 3-gram positions... computed, just assert consistency)
    n_a = con[(1, 2)][1]
    for a in (1, 2, 3, 4):
        for b in (1, 2, 3, 4):
            if a != b:
                assert con[(a, b)] == (1.0, n_a)
    # doc 1's text is a PREFIX of doc 5's: containment(1 -> 5) = 1.0
    assert con[(1, 5)][0] == 1.0


def test_collapsed_simhash_pairs_dup_cluster(spark, dup_corpus):
    from jibaro_spark.operators.dedup import simhash_near_duplicates

    out = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_duplicates(
            dup_corpus.filter(F.col("text").isNotNull()),
            "doc_id", "text", max_hamming=3, shingle_n=2,
        ).collect()
    }
    for a in (1, 2, 3):
        for b in range(a + 1, 5):
            assert out[(a, b)] == 0
    assert out[(8, 9)] == 0
    assert not any(7 in p for p in out)
