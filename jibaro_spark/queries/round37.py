"""Round-37 declared queries — seasonality strength and demand-pattern
classification.

* ``q_seasonal_strength`` — Hyndman-style seasonal strength of daily
  revenue: the share of total variance explained by the day-of-week
  profile, F_s = SSB/SST from exact integer-cents moments (the ANOVA
  decomposition reframed as a forecastability diagnostic).
* ``q_demand_classification`` — Syntetos-Boylan demand-pattern
  classes per product name: ADI (average inter-demand interval in
  days, from first-to-last span over demand-day counts) × CV² of
  demand sizes, cut at the published (1.32, 0.49) boundaries into
  smooth / intermittent / erratic / lumpy — the routing decision in
  front of Croston vs exponential smoothing.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QSEAS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         (date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 4) % 7
           AS dow,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
), g AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DECIMAL(38,0)) AS ss
  FROM daily GROUP BY dow
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(CAST(s AS HUGEINT)) AS BIGINT) AS st,
         CAST(SUM(ss) AS DECIMAL(38,0)) AS sst,
         CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * s / n, 4) AS DECIMAL(38,6)))
              AS DOUBLE) AS sq_over_n
  FROM g
)
SELECT nn AS n_days,
       ROUND((sq_over_n - CAST(st AS DOUBLE) * st / nn)
             / (CAST(sst AS DOUBLE) - CAST(st AS DOUBLE) * st / nn), 6)
         AS seasonal_strength
FROM tot
"""


@declare(
    "q_seasonal_strength",
    oracle=QSEAS_ORACLE,
    description="Hyndman-style seasonal strength of daily revenue: variance share explained by the day-of-week profile (SSB/SST from exact cents moments) — the forecastability diagnostic ahead of Holt-Winters (time series [ext])",
)
def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    dn = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        ((dn + 4) % 7).alias("dow"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("y")
    )
    g = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("ss"),
    )
    sq_over_n = F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n"), 4
    ).cast("decimal(38,6)")
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("st"),
        F.sum("ss").alias("sst"),
        F.sum(sq_over_n).cast("double").alias("sq_over_n"),
    )
    ssb = F.col("sq_over_n") - F.col("st").cast("double") * F.col("st") / F.col("nn")
    sst = F.col("sst").cast("double") - F.col("st").cast("double") * F.col("st") / F.col("nn")
    return tot.select(
        F.col("nn").alias("n_days"),
        F.round(ssb / sst, 6).alias("seasonal_strength"),
    )


QDC_ORACLE = """
WITH daily AS (
  SELECT p.p_name AS product, CAST(l.l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), g AS (
  SELECT product, CAST(COUNT(*) AS BIGINT) AS n_demand_days,
         date_diff('day', MIN(d), MAX(d)) + 1 AS span_days,
         CAST(SUM(CAST(q AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS BIGINT) AS ss
  FROM daily GROUP BY product
), fit AS (
  SELECT product,
         CAST(span_days AS DOUBLE) / n_demand_days AS adi,
         CASE WHEN n_demand_days < 2 THEN 0.0
              ELSE ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_demand_days)
                    / (n_demand_days - 1))
                   / ((CAST(s AS DOUBLE) / n_demand_days)
                      * (CAST(s AS DOUBLE) / n_demand_days)) END AS cv2
  FROM g
), classed AS (
  SELECT CASE WHEN adi < 1.32 AND cv2 < 0.49 THEN 'smooth'
              WHEN adi >= 1.32 AND cv2 < 0.49 THEN 'intermittent'
              WHEN adi < 1.32 THEN 'erratic'
              ELSE 'lumpy' END AS demand_class,
         adi, cv2
  FROM fit
)
SELECT demand_class, CAST(COUNT(*) AS BIGINT) AS n_products,
       ROUND(CAST(SUM(CAST(ROUND(adi, 8) AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*), 6) AS mean_adi,
       ROUND(CAST(SUM(CAST(ROUND(cv2, 8) AS DECIMAL(28,10))) AS DOUBLE)
             / COUNT(*), 6) AS mean_cv2
FROM classed GROUP BY demand_class ORDER BY demand_class
"""


@declare(
    "q_demand_classification",
    oracle=QDC_ORACLE,
    description="Syntetos-Boylan demand-pattern classification per product (ADI × CV² at the published 1.32/0.49 cuts → smooth/intermittent/erratic/lumpy) — the routing decision in front of Croston vs exponential smoothing (supply chain [ext])",
)
def q_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li, p = t["lineitem"], t["part"]
    daily = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.col("p_name").alias("product"),
            F.col("l_shipdate").cast("date").alias("d"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    g = daily.groupBy("product").agg(
        F.count(F.lit(1)).cast("long").alias("n_demand_days"),
        (F.datediff(F.max("d"), F.min("d")) + 1).alias("span_days"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
    )
    adi = F.col("span_days").cast("double") / F.col("n_demand_days")
    mean_q = F.col("s").cast("double") / F.col("n_demand_days")
    cv2 = F.when(F.col("n_demand_days") < 2, F.lit(0.0)).otherwise(
        (
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_demand_days"))
            / (F.col("n_demand_days") - 1)
        )
        / (mean_q * mean_q)
    )
    classed = g.select(
        F.when((adi < 1.32) & (cv2 < 0.49), "smooth")
        .when((adi >= 1.32) & (cv2 < 0.49), "intermittent")
        .when(adi < 1.32, "erratic")
        .otherwise("lumpy")
        .alias("demand_class"),
        adi.alias("adi"),
        cv2.alias("cv2"),
    )
    return (
        classed.groupBy("demand_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_products"),
            F.round(
                F.sum(F.round(F.col("adi"), 8).cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_adi"),
            F.round(
                F.sum(F.round(F.col("cv2"), 8).cast("decimal(28,10)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_cv2"),
        )
        .orderBy("demand_class")
    )
