"""Round-11 guards for grouped_running_carry (VERDICT r10 #3).

The chunk-parallel carry must equal the plain
``Window.partitionBy(group)`` forms bit-for-bit — running
last-non-null under arbitrary direction/null-order specs, running
sums, NULL group keys, NULL carry values — while actually spreading a
hot group across chunks (the whole point: no single-task sort of a hot
key's history)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@pytest.fixture(scope="module")
def carry_df(spark):
    rows = []
    for g in ["a", "b", None, "hot"]:
        n = 400 if g == "hot" else 23
        for i in range(n):
            v = None if (i * 7) % 3 == 0 else f"{g}-{i}"
            rows.append((g, i, v, (i * 13) % 5))
    return spark.createDataFrame(rows, "k string, t long, payload string, amt long")


def test_carry_matches_plain_window_asc(spark, carry_df):
    from jibaro_spark.operators.relational import grouped_running_carry

    out = grouped_running_carry(
        carry_df, ["k"], [F.col("t").asc()],
        last_cols=["payload"], last_out=["carry"],
        sum_cols=["amt"], sum_out=["cum"],
        num_partitions=16,
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = carry_df.withColumn(
        "carry", F.last("payload", ignorenulls=True).over(w)
    ).withColumn("cum", F.sum("amt").over(w))
    got = {(r.k, r.t): (r.carry, r.cum) for r in out.collect()}
    want = {(r.k, r.t): (r.carry, r.cum) for r in exp.collect()}
    assert got == want


def test_carry_matches_plain_window_desc_nulls(spark, carry_df):
    from jibaro_spark.operators.relational import grouped_running_carry

    out = grouped_running_carry(
        carry_df, ["k"], [F.col("t").desc_nulls_last()],
        last_cols=["payload"], last_out=["carry"], num_partitions=16,
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").desc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = carry_df.withColumn("carry", F.last("payload", ignorenulls=True).over(w))
    got = {(r.k, r.t): r.carry for r in out.collect()}
    want = {(r.k, r.t): r.carry for r in exp.collect()}
    assert got == want


def test_hot_group_spans_chunks(spark, carry_df):
    """The range exchange must split the hot group across partitions —
    a primitive that re-clusters whole groups would reintroduce the
    single-task straggler it exists to remove."""
    spread = (
        carry_df.repartitionByRange(16, F.col("k"), F.col("t").asc())
        .withColumn("p", F.spark_partition_id())
        .filter(F.col("k") == "hot")
        .select("p")
        .distinct()
        .count()
    )
    assert spread > 1


def test_carry_input_validation(spark, carry_df):
    from jibaro_spark.operators.relational import grouped_running_carry

    with pytest.raises(ValueError):
        grouped_running_carry(carry_df, ["k"], [F.col("t").asc()])
    with pytest.raises(ValueError):
        grouped_running_carry(
            carry_df, ["k"], [F.col("t").asc()],
            last_cols=["payload"], last_out=[],
        )


def test_rev_carry_matches_plain_desc_window(spark, carry_df):
    """rev_last on the ascending sort == plain running last under the
    exactly-reversed order, computed in the SAME pass as the forward
    carry and the running sums (one range exchange for both
    directions — the r11 attribution merge)."""
    from jibaro_spark.operators.relational import grouped_running_carry

    out = grouped_running_carry(
        carry_df,
        ["k"],
        [F.col("t").asc()],
        last_cols=["payload"],
        last_out=["carry"],
        sum_cols=["amt"],
        sum_out=["cum"],
        rev_last_cols=["payload"],
        rev_last_out=["rcarry"],
        num_partitions=16,
    )
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wd = (
        Window.partitionBy("k")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = (
        carry_df.withColumn(
            "carry", F.last("payload", ignorenulls=True).over(w)
        )
        .withColumn("cum", F.sum("amt").over(w))
        .withColumn("rcarry", F.last("payload", ignorenulls=True).over(wd))
    )
    got = {(r.k, r.t): (r.carry, r.cum, r.rcarry) for r in out.collect()}
    want = {(r.k, r.t): (r.carry, r.cum, r.rcarry) for r in exp.collect()}
    assert got == want


def test_nullable_sum_matches_plain_window(spark):
    """ADVICE r11 #1: running sums over a NULLABLE value column must
    keep the plain window's NULL contract — NULL iff every value in
    the preceding frame is NULL, never 'NULL because this row's CHUNK
    has seen no non-null yet'.  Randomized null placement, including a
    long all-NULL run inside the hot group (so some chunk's local
    running sum is entirely NULL while earlier chunks carried a
    value), and an all-NULL group (result must stay NULL, not 0)."""
    import random

    from jibaro_spark.operators.relational import grouped_running_carry
    from jibaro_spark.operators.relational import grouped_prefix_sum

    rng = random.Random(1112)
    rows = []
    for g in ["a", "allnull", "hot", None]:
        n = 600 if g == "hot" else 31
        for i in range(n):
            if g == "allnull":
                v = None
            elif g == "hot" and 100 <= i < 400:
                v = None  # all-NULL run spanning several 16-way chunks
            else:
                v = rng.randrange(-50, 50) if rng.random() < 0.6 else None
            rows.append((g, i, v))
    df = spark.createDataFrame(rows, "k string, t long, amt long")
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.k, r.t): r.cum
        for r in df.withColumn("cum", F.sum("amt").over(w)).collect()
    }
    carry = grouped_running_carry(
        df, ["k"], [F.col("t").asc()],
        sum_cols=["amt"], sum_out=["cum"], num_partitions=16,
    )
    got = {(r.k, r.t): r.cum for r in carry.collect()}
    assert got == want
    pfx = grouped_prefix_sum(
        df, ["k"], ["t"], "amt", "cum", num_partitions=16
    )
    got2 = {(r.k, r.t): r.cum for r in pfx.collect()}
    assert got2 == want


def test_rev_carry_only(spark, carry_df):
    from jibaro_spark.operators.relational import grouped_running_carry

    out = grouped_running_carry(
        carry_df,
        ["k"],
        [F.col("t").desc_nulls_last()],
        rev_last_cols=["payload"],
        rev_last_out=["rc"],
        num_partitions=16,
    )
    wd = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    exp = carry_df.withColumn(
        "rc", F.last("payload", ignorenulls=True).over(wd)
    )
    got = {(r.k, r.t): r.rc for r in out.collect()}
    want = {(r.k, r.t): r.rc for r in exp.collect()}
    assert got == want
