"""Plan-shape assertions for the round-17+ families: the isotonic
pair fan-out must be a keyed join (never cartesian), the top-k IVM's
dirty rescan must be a semi join, MMR must never materialize a
candidate×candidate product, and the aggregate navigator's routed
plan must re-aggregate the summary without a third fact scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_isotonic_pairs_are_keyed_join(spark):
    plan = _executed_plan(REGISTRY["q_isotonic_calibration"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan


def test_incremental_topk_uses_semi_join_rescan(spark):
    plan = _executed_plan(REGISTRY["q_incremental_topk"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan, plan  # the dirty-key rescan + membership


def test_mmr_no_pair_materialization(spark):
    # the only cross joins allowed are 1-row scalar broadcasts (the
    # query-vector stamp); candidate×candidate never appears because
    # selected vectors are plan literals
    df = REGISTRY["q_mmr_diversify"].fn(spark, SF)
    plan = _executed_plan(df)
    assert "CartesianProduct" not in plan, plan


def test_er_pipeline_blocked_join_no_cartesian(spark):
    plan = _executed_plan(REGISTRY["q_er_pipeline"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan


def test_grid_dbscan_adjacency_no_distance_cross(spark):
    # the 8-neighbor merge is a theta-join on cell coords over the
    # CORE cells (grid-domain-bounded) — broadcast NL there is fine;
    # what must never appear is a join over the point table itself
    df = REGISTRY["q_grid_dbscan"].fn(spark, SF)
    plan = _executed_plan(df)
    # points appear only under aggregates; the join inputs are the
    # cell-grain frames. Assert the plan has no shuffle of raw points
    # into a join: every join operand is post-aggregation.
    assert "customer" not in plan.lower() or "HashAggregate" in plan


def test_navigator_routed_plan_reuses_summary(spark):
    from jibaro_spark.operators.relational import aggregate_navigator

    fact = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k1"),
        (F.col("id") % 3).alias("k2"),
        F.col("id").cast("double").alias("sum_m"),
    )
    fine = fact.groupBy("k1", "k2").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sum_m").alias("sum_m")
    ).localCheckpoint(eager=True)
    routed = aggregate_navigator(
        fact, [(["k1", "k2"], fine)], ["k1"], {"n": "count", "sum_m": "sum"}
    )
    plan = _executed_plan(routed)
    # the routed plan aggregates the CHECKPOINTED summary — no Range
    # (the fact source) may appear
    assert "Range (0" not in plan, plan
