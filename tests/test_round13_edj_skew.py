"""Round-13 skew-safety guards for ``edit_distance_join``'s block path.

The blocked candidate join runs behind ``dense_exchange``, which opts
out of AQE skew-splitting; r13 adds a per-block count probe and a k×k
deterministic salt grid past the hot-block bound so a skewed block key
cannot hot-spot a single task with the quadratic verify (VERDICT r12
#4/#7).  Pinned here, on a fixture whose hottest block holds 50% of
both sides:

* the probe decision: balanced blocks → dense route; the 50%-hot key
  (with the absolute floor lowered to test scale) → grid route;
* pair-set identity: grid-salted join ≡ plain block equi-join ≡ the
  r12 unprobed route (``JIBARO_SPARK_EDJ_SKEW=0``), end-to-end through
  ``edit_distance_join``;
* spread: under the grid the hot block's pair fan-out lands on many
  partitions (max per-partition rows ≪ the hot block's full product —
  the unsalted exchange puts ALL of it in one partition).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import jibaro_spark.operators.dedup as dd


@pytest.fixture(scope="module")
def hot_sides(spark):
    # 400 rows/side, 200 of them in one hot block, rest over 50 blocks
    lrows = [
        (i, f"s{i % 7}", "hot" if i < 200 else f"b{i % 50}")
        for i in range(400)
    ]
    rrows = [
        (10_000 + i, f"s{(i + 1) % 7}", "hot" if i < 200 else f"b{i % 50}")
        for i in range(400)
    ]
    l = spark.createDataFrame(lrows, "lid long, __ls string, __blk string")
    r = spark.createDataFrame(rrows, "rid long, __rs string, __blk string")
    return l, r


def _pairs(df):
    return sorted((r["lid"], r["rid"]) for r in df.select("lid", "rid").collect())


def test_grid_triggers_and_matches_plain(monkeypatch, hot_sides):
    l, r = hot_sides
    monkeypatch.setattr(dd, "_EDJ_BLOCK_MAX_ABS", 100)
    monkeypatch.delenv("JIBARO_SPARK_EDJ_SKEW", raising=False)
    out = dd._block_join_skew_safe(l, r, "lid", "rid")
    # the salt columns must not leak
    assert set(out.columns) == {"lid", "__ls", "__blk", "rid", "__rs"}
    expected = _pairs(l.join(r, ["__blk"]))
    got = _pairs(out)
    # hot product + 50 balanced blocks of 4x4
    assert got == expected and len(got) == 200 * 200 + 4 * 4 * 50


def test_grid_spreads_hot_block(monkeypatch, hot_sides, spark):
    l, r = hot_sides
    monkeypatch.setattr(dd, "_EDJ_BLOCK_MAX_ABS", 100)
    # force the shuffle join (at test scale the planner broadcasts one
    # side, which has no skew problem — the grid exists for the 100 TB
    # shuffle case)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dd._block_join_skew_safe(l, r, "lid", "rid")
        pid_counts = [
            row["c"]
            for row in out.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    hot_product = 200 * 200
    # the unsalted exchange puts the whole hot product in ONE partition;
    # the grid must spread it over many
    assert max(pid_counts) < hot_product / 4
    assert len(pid_counts) > 4


def test_balanced_blocks_keep_dense_route(monkeypatch, spark):
    l = spark.createDataFrame(
        [(i, f"s{i}", f"b{i % 20}") for i in range(200)],
        "lid long, __ls string, __blk string",
    )
    r = spark.createDataFrame(
        [(1000 + i, f"s{i}", f"b{i % 20}") for i in range(200)],
        "rid long, __rs string, __blk string",
    )
    monkeypatch.setattr(dd, "_EDJ_BLOCK_MAX_ABS", 100)
    out = dd._block_join_skew_safe(l, r, "lid", "rid")
    # balanced: no salt replication — row count is the exact block join
    assert out.count() == l.join(r, ["__blk"]).count()
    assert _pairs(out) == _pairs(l.join(r, ["__blk"]))


def test_end_to_end_regimes_identical(monkeypatch, spark):
    words = ["alpha", "alphq", "beta", "betta", "gamma", "gamna", "delta"]
    rows = [
        (i, words[i % len(words)] + ("x" if i % 11 == 0 else ""), "hot" if i % 2 else f"b{i % 9}")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "id long, s string, blk string")
    left = df.select(F.col("id").alias("a_id"), F.col("s").alias("a_s"), F.col("blk").alias("a_b"))
    right = df.select(F.col("id").alias("b_id"), F.col("s").alias("b_s"), F.col("blk").alias("b_b"))
    monkeypatch.setattr(dd, "_EDJ_BLOCK_MAX_ABS", 50)

    def run():
        out = dd.edit_distance_join(
            left, right, "a_id", "b_id", "a_s", "b_s",
            max_dist=1, block_on=("a_b", "b_b"),
        )
        return sorted(
            (r["a_id"], r["b_id"], r["dist"], r["block"]) for r in out.collect()
        )

    monkeypatch.setenv("JIBARO_SPARK_EDJ_SKEW", "1")
    on = run()
    monkeypatch.setenv("JIBARO_SPARK_EDJ_SKEW", "0")
    off = run()
    assert on == off
    assert on  # non-vacuous
