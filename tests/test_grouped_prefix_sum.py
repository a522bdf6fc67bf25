"""grouped_prefix_sum: chunked per-group running sums must equal the
plain window on any input (the primitive exists so a corpus-sized
group never becomes one task — correctness must not depend on how
groups straddle range chunks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.operators.relational import grouped_prefix_sum


def _window_truth(df, group, order, val):
    w = (
        Window.partitionBy(group)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("__truth", F.sum(val).over(w))


@pytest.mark.parametrize("n_parts", [2, 7, 32])
def test_parity_with_plain_window_across_chunkings(spark, n_parts):
    """One hot group (80% of rows) + many small ones; every chunking
    must reproduce the sequential running sum exactly (bigint lane)."""
    rows = [(("hot" if i % 5 != 0 else f"g{i % 13}"), i, i * 7 % 101) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, i long, v long")
    got = grouped_prefix_sum(df, ["g"], ["i"], "v", out_col="cum", num_partitions=n_parts)
    truth = _window_truth(df, "g", ["i"], "v")
    j = got.join(truth, ["g", "i", "v"])
    assert j.where(F.col("cum") != F.col("__truth")).count() == 0
    assert got.count() == 2000


def test_decimal_lane_is_exact(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i, f"{i}.25") for i in range(300)], "g string, i long, v string"
    ).withColumn("v", F.col("v").cast("decimal(18,2)"))
    got = grouped_prefix_sum(df, ["g"], ["i"], "v", out_col="cum", num_partitions=5)
    truth = _window_truth(df, "g", ["i"], "v")
    j = got.join(truth, ["g", "i"])
    assert j.where(F.col("cum") != F.col("__truth")).count() == 0


def test_single_row_groups_and_empty_input(spark):
    df = spark.createDataFrame([(f"g{i}", 1, 10) for i in range(20)], "g string, i long, v long")
    got = grouped_prefix_sum(df, ["g"], ["i"], "v", out_col="cum", num_partitions=4)
    assert got.where(F.col("cum") != 10).count() == 0
    empty = df.where(F.lit(False))
    assert grouped_prefix_sum(empty, ["g"], ["i"], "v", num_partitions=4).count() == 0


@pytest.mark.parametrize("bcast", [True, False])
def test_total_cols_match_group_totals(spark, bcast):
    """total_cols stamps each row with its exact group total (both the
    broadcast and the keyed-shuffle rejoin lanes), from the chunk
    totals the pipeline already owns — no second scan of the input."""
    rows = [((f"g{i % 4}"), i, i % 11, (i * 3) % 7) for i in range(600)]
    df = spark.createDataFrame(rows, "g string, i long, x long, y long")
    got = grouped_prefix_sum(
        df, ["g"], ["i"], ["x", "y"], ["cx", "cy"],
        num_partitions=6, total_cols=["tx", "ty"], broadcast_totals=bcast,
    )
    truth = df.groupBy("g").agg(
        F.sum("x").alias("__tx"), F.sum("y").alias("__ty")
    )
    j = got.join(truth, "g")
    assert (
        j.where(
            (F.col("tx") != F.col("__tx")) | (F.col("ty") != F.col("__ty"))
        ).count()
        == 0
    )
    assert got.count() == 600
    # last row of each group: running sum == total
    last = got.where(F.col("i") >= 596)
    assert last.where(F.col("cx") != F.col("tx")).count() == 0
    with pytest.raises(ValueError):
        grouped_prefix_sum(
            df, ["g"], ["i"], ["x", "y"], ["cx", "cy"], total_cols=["onlyone"]
        )


def test_plan_has_no_single_partition_and_no_collect(spark):
    """The whole pipeline is windows partitioned by (chunk, group) /
    (group) plus one keyed join — no SinglePartition anywhere."""
    df = spark.createDataFrame(
        [("a", i, i) for i in range(100)], "g string, i long, v long"
    )
    out = grouped_prefix_sum(df, ["g"], ["i"], "v", num_partitions=8)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
