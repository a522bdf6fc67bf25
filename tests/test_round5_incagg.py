"""Laws of incremental aggregate maintenance
(operators/cdc.incremental_agg_apply): empty-delta identity, count-zero
key eviction, and update-net-zero count."""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.operators.cdc import incremental_agg_apply

CHG_SCHEMA = (
    "op string, k long, before_total double, after_total double"
)


def _agg(spark, rows):
    return spark.createDataFrame(
        rows, "k long, n long, total double"
    ).withColumn("total", F.col("total").cast("decimal(28,4)"))


def _snap(df):
    return {
        r["k"]: (r["n"], float(r["total"])) for r in df.collect()
    }


def test_empty_delta_is_identity(spark):
    agg = _agg(spark, [(1, 3, 30.0), (2, 1, 5.5)])
    empty = spark.createDataFrame([], CHG_SCHEMA)
    out = incremental_agg_apply(
        agg, empty, ["k"], ["total"], count_col="n",
        before_prefix="before_", after_prefix="after_",
    )
    assert _snap(out) == _snap(agg)


def test_deletes_evict_zero_count_keys(spark):
    agg = _agg(spark, [(1, 2, 20.0), (2, 1, 5.0)])
    chg = spark.createDataFrame(
        [("d", 2, 5.0, None), ("d", 1, 8.0, None)], CHG_SCHEMA
    )
    out = incremental_agg_apply(agg, chg, ["k"], ["total"], count_col="n",
                                before_prefix="before_", after_prefix="after_")
    got = _snap(out)
    assert 2 not in got, "count-0 key must be evicted"
    assert got[1] == (1, 12.0)


def test_update_nets_zero_count_and_shifts_sum(spark):
    agg = _agg(spark, [(1, 2, 20.0)])
    chg = spark.createDataFrame([("u", 1, 7.0, 9.5)], CHG_SCHEMA)
    out = incremental_agg_apply(agg, chg, ["k"], ["total"], count_col="n",
                                before_prefix="before_", after_prefix="after_")
    assert _snap(out) == {1: (2, 22.5)}


def test_insert_into_fresh_key(spark):
    agg = _agg(spark, [(1, 1, 10.0)])
    chg = spark.createDataFrame(
        [("c", 9, None, 4.25), ("c", 9, None, 1.0)], CHG_SCHEMA
    )
    out = incremental_agg_apply(agg, chg, ["k"], ["total"], count_col="n",
                                before_prefix="before_", after_prefix="after_")
    assert _snap(out) == {1: (1, 10.0), 9: (2, 5.25)}


def test_incremental_equals_full_recompute(spark):
    """The maintained invariant on random-ish data: applying a mixed
    delta incrementally equals re-aggregating the mutated base."""
    base = spark.range(200).select(
        F.col("id").alias("rowid"),
        (F.col("id") % 13).alias("k"),
        (F.col("id") * 1.25 + 3).alias("v"),
    )
    agg = base.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(28,4)")).alias("total"),
    )
    deletes = base.filter(F.col("rowid") % 7 == 0)
    updates = base.filter((F.col("rowid") % 7 != 0) & (F.col("rowid") % 5 == 0))
    chg = (
        deletes.select(
            F.lit("d").alias("op"), "k",
            F.col("v").alias("before_total"),
            F.lit(None).cast("double").alias("after_total"),
        )
        .unionByName(
            updates.select(
                F.lit("u").alias("op"), "k",
                F.col("v").alias("before_total"),
                (F.col("v") + 11.5).alias("after_total"),
            )
        )
    )
    inc = incremental_agg_apply(agg, chg, ["k"], ["total"], count_col="n",
                                before_prefix="before_", after_prefix="after_")
    mutated = base.filter(F.col("rowid") % 7 != 0).withColumn(
        "v",
        F.when(F.col("rowid") % 5 == 0, F.col("v") + 11.5).otherwise(F.col("v")),
    )
    full = mutated.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(28,4)")).alias("total"),
    )
    assert _snap(inc) == _snap(full)
