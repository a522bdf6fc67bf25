"""Round-12 guards for the ADAPTIVE plain-window routing of
``grouped_running_carry``.

The chunked carry (range partition + per-chunk carries + stitch join)
is hot-key insurance; round 12 adds a construction-time group-size
probe (``_carry_routes_plain``) that routes balanced inputs through
plain ``Window.partitionBy(group)`` windows instead — measured ~2×
cheaper at sf0.1 where no group is hot.  Pinned here:

* the routing decision: balanced input → plain, one dominant group
  (with the absolute floor lowered so a test-sized corpus can trip
  it) → chunked;
* bit-identical output across the two regimes on the same input, for
  all three carry kinds at once (fwd last, reversed last, running
  sum) including NULL values, a NULL group key, and all-NULL prefixes
  (the running-sum NULL contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import jibaro_spark.operators.relational as rel


@pytest.fixture(scope="module")
def balanced(spark):
    rows = []
    for g in range(8):
        for i in range(40):
            rows.append(
                (
                    f"g{g}" if g else None,  # one NULL group key
                    i,
                    None if (i + g) % 5 == 0 else i * 10 + g,
                    None if i < 3 else i,  # all-NULL prefix for sums
                )
            )
    return spark.createDataFrame(rows, "k string, t int, v int, s int")


def _run(df, adaptive):
    out = rel.grouped_running_carry(
        df,
        ["k"],
        [F.col("t").asc()],
        last_cols=["v"],
        last_out=["lv"],
        sum_cols=["s"],
        sum_out=["ss"],
        rev_last_cols=["v"],
        rev_last_out=["rv"],
        adaptive=adaptive,
    )
    return sorted(
        (
            (r["k"], r["t"], r["v"], r["s"], r["lv"], r["rv"], r["ss"])
            for r in out.collect()
        ),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_routing_decision(spark, balanced):
    # balanced: biggest group 40 rows, far under the floor → plain
    assert rel._carry_routes_plain(balanced, [F.col("k")], 4)
    hot = balanced.unionByName(
        spark.range(2000).select(
            F.lit("hot").alias("k"),
            F.col("id").cast("int").alias("t"),
            F.col("id").cast("int").alias("v"),
            F.lit(1).cast("int").alias("s"),
        )
    )
    # hot group = 2000 of 2320 rows: over half a 4-partition fair
    # share; drop the absolute floor so test-sized data can trip it
    old = rel._CARRY_PLAIN_MAX_ABS
    try:
        rel._CARRY_PLAIN_MAX_ABS = 100
        assert not rel._carry_routes_plain(hot, [F.col("k")], 4)
    finally:
        rel._CARRY_PLAIN_MAX_ABS = old


def test_plain_equals_chunked(spark, balanced):
    """THE r12 invariant: same input, both regimes, identical rows —
    forced via adaptive=True (routes plain: max group 40) vs
    adaptive=False (always chunked)."""
    assert _run(balanced, True) == _run(balanced, False)


def test_schema_identical_across_regimes(spark, balanced):
    a = rel.grouped_running_carry(
        balanced, ["k"], [F.col("t").asc()], last_cols=["v"],
        last_out=["lv"], sum_cols=["s"], sum_out=["ss"],
        rev_last_cols=["v"], rev_last_out=["rv"], adaptive=True,
    )
    b = rel.grouped_running_carry(
        balanced, ["k"], [F.col("t").asc()], last_cols=["v"],
        last_out=["lv"], sum_cols=["s"], sum_out=["ss"],
        rev_last_cols=["v"], rev_last_out=["rv"], adaptive=False,
    )
    assert a.schema == b.schema


def test_prefix_sum_plain_equals_chunked(spark, balanced):
    """Same invariant for grouped_prefix_sum's adaptive route,
    including the total_cols lane and the running-sum NULL contract."""

    def run(adaptive):
        out = rel.grouped_prefix_sum(
            balanced, ["k"], ["t"], ["s", "v"], ["cs", "cv"],
            total_cols=["ts", "tv"], adaptive=adaptive,
        )
        return sorted(
            (
                (r["k"], r["t"], r["cs"], r["cv"], r["ts"], r["tv"])
                for r in out.collect()
            ),
            key=lambda t: tuple((x is None, x) for x in t),
        )

    assert run(True) == run(False)
