"""Round-20 declared queries — intermittent-demand forecasting.

* ``q_croston_demand`` — Croston's method over a deliberately
  THINNED demand series (orders with ``o_orderkey % 50 = 0``) on a
  dense zero-filled 400-day calendar window per priority
  (``operators/sequential.croston``).  The zero-fill matters: the
  method's whole point is separating demand SIZE from demand
  INTERVAL, which requires the zero periods to exist as rows.  α=1/2
  keeps every smoothing step an exact IEEE expression, so the
  recursive-CTE oracle replay is bit-identical (the q_holt_forecast /
  q_holt_winters discipline).

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QCROSTON_ORACLE = """
WITH RECURSIVE bounds AS (
  SELECT date_diff('day', DATE '1970-01-01', MIN(CAST(o_orderdate AS DATE))) AS d0,
         LEAST(date_diff('day', DATE '1970-01-01', MAX(CAST(o_orderdate AS DATE))),
               date_diff('day', DATE '1970-01-01', MIN(CAST(o_orderdate AS DATE))) + 399)
           AS d1
  FROM orders
), pr AS (
  SELECT DISTINCT o_orderpriority AS priority FROM orders
), cal AS (
  SELECT pr.priority, CAST(b.d0 + g.i AS BIGINT) AS dn
  FROM pr CROSS JOIN bounds b
  CROSS JOIN (SELECT unnest(generate_series(0,
              (SELECT d1 - d0 FROM bounds))) AS i) g
), dem AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dn,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM orders CROSS JOIN bounds b
  WHERE o_orderkey % 50 = 0
    AND date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) <= b.d1
  GROUP BY 1, 2
), seq AS (
  SELECT c.priority, c.dn, COALESCE(d.x, 0.0) AS x,
         ROW_NUMBER() OVER (PARTITION BY c.priority ORDER BY c.dn) AS rn
  FROM cal c LEFT JOIN dem d USING (priority, dn)
), rec AS (
  SELECT priority, dn, rn, x,
         CASE WHEN x > 0 THEN x END AS z,
         CASE WHEN x > 0 THEN CAST(1.0 AS DOUBLE) END AS p,
         CASE WHEN x > 0 THEN 1 ELSE 2 END AS q
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.priority, s.dn, s.rn, s.x,
         CASE WHEN s.x > 0 AND r.z IS NULL THEN s.x
              WHEN s.x > 0 THEN 0.5 * s.x + 0.5 * r.z
              ELSE r.z END,
         CASE WHEN s.x > 0 AND r.z IS NULL THEN CAST(r.q AS DOUBLE)
              WHEN s.x > 0 THEN 0.5 * CAST(r.q AS DOUBLE) + 0.5 * r.p
              ELSE r.p END,
         CASE WHEN s.x > 0 THEN 1 ELSE r.q + 1 END
  FROM rec r JOIN seq s ON s.priority = r.priority AND s.rn = r.rn + 1
)
SELECT priority, dn, x,
       ROUND(z, 6) AS z_hat, ROUND(p, 6) AS p_hat,
       ROUND(z / p, 6) AS forecast
FROM rec
WHERE x > 0 OR rn % 25 = 0
ORDER BY priority, dn
"""


@declare(
    "q_croston_demand",
    oracle=QCROSTON_ORACLE,
    description="Croston intermittent-demand forecasting (α=1/2) of a thinned order series on a dense zero-filled 400-day calendar window per priority — demand-size and demand-interval states, bit-identical recursive-CTE replay; output sampled to demand days + every-25th zero day (forecasting [ext])",
)
def q_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sequential import croston

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    dn_expr = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    # 400-day study window: Croston's behaviour is fully exercised in
    # ~400 periods, and the oracle's recursion depth stays bounded
    bounds = orders.agg(
        F.min(dn_expr).alias("d0"),
        F.least(F.max(dn_expr), F.min(dn_expr) + 399).alias("d1"),
    )
    pr = orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    cal = (
        pr.crossJoin(F.broadcast(bounds))
        .select(
            "priority",
            F.explode(F.sequence(F.lit(0), F.col("d1") - F.col("d0"))).alias("i"),
            "d0",
        )
        .select("priority", (F.col("d0") + F.col("i")).cast("long").alias("dn"))
    )
    dem = (
        orders.filter(F.col("o_orderkey") % 50 == 0)
        .crossJoin(F.broadcast(bounds))
        .filter(dn_expr <= F.col("d1"))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            dn_expr.cast("long").alias("dn"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    seq = cal.join(dem, ["priority", "dn"], "left").select(
        "priority", "dn", F.coalesce(F.col("x"), F.lit(0.0)).alias("x")
    )
    out = croston(seq, keys=["priority"], order_by=["dn"], value_col="x")
    # sample the (calendar-sized) output: every demand day + every
    # 25th zero day, so rows stay bounded while both update branches
    # stay visible to the hash check
    from pyspark.sql.window import Window

    w = Window.partitionBy("priority").orderBy("dn")
    out = out.withColumn("__rn", F.row_number().over(w))
    return (
        out.filter((F.col("x") > 0) | (F.col("__rn") % 25 == 0))
        .select(
            "priority",
            "dn",
            "x",
            F.round("z_hat", 6).alias("z_hat"),
            F.round("p_hat", 6).alias("p_hat"),
            F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("forecast"),
        )
        .orderBy("priority", "dn")
    )
