"""Round-22 family tests: Mann-Kendall S/variance laws, runs-test
bounds, Fano/burstiness ranges, and aggregate-navigator routing
(picks the right summary, never the fact; answers match a direct
fact aggregation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.operators.relational import aggregate_navigator
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_mann_kendall_laws(spark):
    rows = REGISTRY["q_mann_kendall"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        n = r["n_months"]
        max_s = n * (n - 1) // 2
        assert -max_s <= r["s_stat"] <= max_s
        assert r["var_s"] > 0
        # |Z| can't exceed the untied extreme
        assert abs(r["z"]) <= (max_s) / (r["var_s"] ** 0.5) + 1e-6


def test_runs_test_bounds(spark):
    r = REGISTRY["q_runs_test"].fn(spark, SF).collect()[0]
    assert 1 <= r["n_runs"] <= r["n1"] + r["n2"]
    assert r["n1"] > 0 and r["n2"] > 0
    # runs alternate at most 2*min+1 times
    assert r["n_runs"] <= 2 * min(r["n1"], r["n2"]) + 1


def test_fano_burstiness_ranges(spark):
    rows = REGISTRY["q_fano_burstiness"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["mean_rate"] > 0
        assert r["fano"] >= 0
        assert -1.0 <= r["burstiness"] <= 1.0


def test_navigator_picks_smallest_covering_summary(spark):
    fact = spark.createDataFrame(
        [("a", "x", 1, 10.0), ("a", "y", 2, 20.0), ("b", "x", 3, 30.0)],
        "k1 string, k2 string, idx int, m double",
    ).select("k1", "k2", F.col("m").alias("sum_m"))
    fine = fact.groupBy("k1", "k2").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sum_m").alias("sum_m")
    )
    coarse = fact.groupBy("k1").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sum_m").alias("sum_m")
    )
    routed = aggregate_navigator(
        fact,
        [(["k1", "k2"], fine), (["k1"], coarse)],
        keys=["k1"],
        measures={"n": "count", "sum_m": "sum"},
    )
    got = {(r["k1"], r["n"], r["sum_m"]) for r in routed.collect()}
    assert got == {("a", 2, 30.0), ("b", 1, 30.0)}
    # no covering summary → falls back to the fact
    routed2 = aggregate_navigator(
        fact,
        [(["k1"], coarse)],
        keys=["k2"],
        measures={"n": "count", "sum_m": "sum"},
    )
    got2 = {(r["k2"], r["n"], r["sum_m"]) for r in routed2.collect()}
    assert got2 == {("x", 2, 40.0), ("y", 1, 20.0)}


def test_navigator_query_routes_off_the_fact(spark):
    # plan check: the routed frame's lineage re-aggregates the fine
    # summary (two aggregates stacked), not a third fact pass — assert
    # the answer matches a direct fact aggregation exactly
    out = {
        (r["returnflag"], r["n_items"], r["sum_qty"])
        for r in REGISTRY["q_agg_navigator"].fn(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    direct = {
        (r["returnflag"], r["n_items"], r["sum_qty"])
        for r in li.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .collect()
    }
    assert out == direct
