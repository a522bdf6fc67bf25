"""Pipeline declared queries — the reference's CDC semantics expressed
over the driver fixtures, oracle-checked end to end.

The envelope is synthesized deterministically from ``orders`` (both in
Spark and in the DuckDB oracle), so the MERGE semantics of reference
``cdc.py:178-216`` are hash-verified without Kafka/Debezium/Delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.operators.cdc import cdc_apply
from jibaro_spark.queries.registry import declare, load_tables

# Deterministic change assignment over orders:
#   o_orderkey % 10 == 0 → 'd' (delete)
#   o_orderkey % 7  == 0 → 'u' (update: totalprice + 1000.0)
#   o_orderkey % 4  == 0 → 'c' (insert — these keys are excluded from
#                               the initial target state)
# Initial target = orders with o_orderkey % 4 != 0, op 'r' (snapshot).
_OP_SQL = """
CASE WHEN o_orderkey % 10 = 0 THEN 'd'
     WHEN o_orderkey % 7 = 0 THEN 'u'
     WHEN o_orderkey % 4 = 0 THEN 'c'
END
"""

QCDC_ORACLE = f"""
WITH target AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, 'r' AS op
  FROM orders WHERE o_orderkey % 4 <> 0
), batch AS (
  SELECT o_orderkey,
         o_custkey,
         CASE WHEN {_OP_SQL} = 'u' THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
         o_orderstatus,
         {_OP_SQL} AS op
  FROM orders
  WHERE {_OP_SQL} IS NOT NULL
)
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, op
FROM (
  SELECT t.* FROM target t
  WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus, op
  FROM batch WHERE op <> 'd'
)
ORDER BY o_orderkey
"""


def _synthetic_envelope(orders: DataFrame) -> DataFrame:
    """Debezium-shaped envelope (FIXTURES §1.3) derived from orders."""
    op = (
        F.when(F.col("o_orderkey") % 10 == 0, "d")
        .when(F.col("o_orderkey") % 7 == 0, "u")
        .when(F.col("o_orderkey") % 4 == 0, "c")
    )
    row_now = F.struct(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("__op") == "u", F.col("o_totalprice") + F.lit(1000.0)
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderstatus",
    )
    row_before = F.struct("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    return (
        orders.withColumn("__op", op)
        .filter(F.col("__op").isNotNull())
        .select(
            F.struct(F.col("o_orderkey")).alias("key"),
            F.struct(
                F.col("__op").alias("op"),
                F.when(F.col("__op") != "c", row_before).alias("before"),
                F.when(F.col("__op") != "d", row_now).alias("after"),
            ).alias("value"),
            F.col("o_orderdate").alias("timestamp"),
        )
    )


@declare(
    "q_cdc_merge_orders",
    oracle=QCDC_ORACLE,
    description="Debezium CDC MERGE semantics: matched-update / not-matched-insert / matched-delete (A7,K4,J3)",
)
def q_cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    target = orders.filter(F.col("o_orderkey") % 4 != 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus", F.lit("r").alias("op")
    )
    envelope = _synthetic_envelope(orders)
    return cdc_apply(target, envelope, key_cols=["o_orderkey"]).orderBy("o_orderkey")


# Multi-change-per-key batch: two envelope rows per key (an insert then
# an update at a later timestamp) — exercises the per-batch
# latest-per-key pre-dedup (A3) feeding MERGE (reference cdc.py:129-142).
QCDC2_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0
)
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice ELSE o_totalprice + 500.0 END AS o_totalprice,
       CASE WHEN o_orderkey % 5 = 0 THEN 'c' ELSE 'u' END AS op
FROM base
WHERE o_orderkey % 7 != 0
ORDER BY o_orderkey
"""


@declare(
    "q_cdc_dedup_batch",
    oracle=QCDC2_ORACLE,
    description="latest-per-key pre-dedup of a multi-change batch before MERGE (A3 within CDC)",
)
def q_cdc_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    base = orders.filter(F.col("o_orderkey") % 3 == 0)
    mk = lambda price_col, op, ts_off: base.select(  # noqa: E731
        F.struct(F.col("o_orderkey")).alias("key"),
        F.struct(
            F.lit(op).alias("op"),
            F.lit(None).cast("struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>").alias("before"),
            F.struct("o_orderkey", "o_custkey", price_col.alias("o_totalprice")).alias("after"),
        ).alias("value"),
        (F.col("o_orderdate") + F.expr(f"INTERVAL {ts_off} SECOND")).alias("timestamp"),
    )
    # op mix in the surviving output: keys %5==0 get only the insert
    # ('c' survives), others get a later update ('u' wins), and keys
    # %7==0 get a final delete (dropped entirely) — latest-per-key must
    # order correctly across all three op kinds, and the output op
    # column genuinely varies.
    envelope = (
        mk(F.col("o_totalprice"), "c", 0)
        .unionByName(
            mk(F.col("o_totalprice") + F.lit(500.0), "u", 60).filter(
                F.col("key.o_orderkey") % 5 != 0
            )
        )
        .unionByName(
            mk(F.col("o_totalprice"), "d", 120).filter(
                F.col("key.o_orderkey") % 7 == 0
            )
        )
    )
    empty_target = envelope.sparkSession.createDataFrame(
        [], "o_orderkey bigint, o_custkey bigint, o_totalprice double, op string"
    )
    return cdc_apply(empty_target, envelope, key_cols=["o_orderkey"]).orderBy(
        "o_orderkey"
    )
