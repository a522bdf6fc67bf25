"""Round-15 declared queries — distinct-count IVM (the
state-maintenance wing), companion to the pytest-only
stats-pruned read (``maintenance.read_pruned``, verified by file-count
assertion in ``tests/test_round15_ops.py`` — it reads derived local
tables, so it has no sf-parquet query form).

* ``q_incremental_distinct`` — ``COUNT(DISTINCT customer) per
  priority`` maintained under a deterministic CDC batch through the
  auxiliary multiplicity table
  (``operators/cdc.incremental_distinct_apply``); oracle recomputes
  the post-change distinct counts from scratch.
(Row-level snapshot diffing already ships as round4's
``q_snapshot_diff``.)

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Distinct-count IVM.  Base view: distinct ordering customers per
# priority.  CDC batch: delete every order with key %89 == 0 (each
# delete is an occurrence-delete of that order's (priority, customer)
# pair) and insert key-shifted copies for %101 with the customer
# shifted by +3000000 (new distinct values).  The auxiliary
# multiplicity table absorbs both; the oracle recomputes from the
# post-change fact.

QID_ORACLE = """
WITH fact AS (
  SELECT * FROM orders
  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
    AND o_orderpriority IS NOT NULL
), f1 AS (
  SELECT o_orderpriority AS pr, o_custkey AS ck
  FROM fact WHERE o_orderkey % 89 <> 0
  UNION ALL
  SELECT o_orderpriority, o_custkey + 3000000
  FROM fact WHERE o_orderkey % 101 = 0 AND o_orderkey % 89 <> 0
)
SELECT pr, CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_distinct
FROM f1 GROUP BY pr ORDER BY pr
"""


@declare(
    "q_incremental_distinct",
    oracle=QID_ORACLE,
    description="COUNT(DISTINCT) IVM via the auxiliary multiplicity table: occurrence-level CDC deltas merge with ONE keyed outer join, never touching the fact; oracle = scratch recompute (IVM [ext])",
)
def q_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.cdc import incremental_distinct_apply

    o = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): a NULL orderkey escapes
    # the modulo delete filter and a NULL custkey is not a distinct
    # value under SQL COUNT(DISTINCT) — fence both, as in the oracle
    o = o.filter(
        F.col("o_orderkey").isNotNull()
        & F.col("o_custkey").isNotNull()
        & F.col("o_orderpriority").isNotNull()
    )
    base = o.select(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("k"),
    )
    aux0 = base.groupBy("pr", "ck").agg(F.count(F.lit(1)).alias("mult"))
    dels = base.filter(F.col("k") % 89 == 0).select(
        "pr", "ck", F.lit("d").alias("op")
    )
    ins = base.filter((F.col("k") % 101 == 0) & (F.col("k") % 89 != 0)).select(
        "pr", (F.col("ck") + 3000000).alias("ck"), F.lit("c").alias("op")
    )
    aux1 = incremental_distinct_apply(
        aux0, dels.unionByName(ins), group_cols="pr", value_col="ck"
    )
    return (
        aux1.groupBy("pr")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct"))
        .orderBy("pr")
    )
