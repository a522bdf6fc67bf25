"""Round-29 declared queries — inventory analytics.

* ``q_abc_xyz`` — the classic inventory segmentation matrix: ABC
  classes from the revenue Pareto (cumulative share at 80%/95% cuts
  over parts ranked by revenue — computed with the CHUNKED
  distributed prefix sum, never a single-partition window) crossed
  with XYZ demand-variability classes (CV of weekly demand:
  X<0.5, Y<1, Z≥1); per-cell part counts and revenue share.
* ``q_safety_stock`` — per product-name demand statistics → safety
  stock z·σ_d·√LT (z=1.645, LT=7 days) and the reorder point
  μ_d·LT + SS, from exact integer daily-demand moments.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS r
  FROM lineitem GROUP BY l_partkey
), ranked AS (
  SELECT pk, r,
         SUM(r) OVER (ORDER BY r DESC, pk) AS cum,
         SUM(r) OVER () AS tot
  FROM rev
), abc AS (
  SELECT pk, r,
         CASE WHEN CAST(cum AS DOUBLE) / tot <= 0.80 THEN 'A'
              WHEN CAST(cum AS DOUBLE) / tot <= 0.95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked
), weekly AS (
  SELECT l_partkey AS pk, date_trunc('week', CAST(l_shipdate AS TIMESTAMP)) AS w,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
), cv AS (
  SELECT pk,
         CASE WHEN COUNT(*) < 2 OR SUM(q) = 0 THEN 0.0
              ELSE sqrt((CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE)
                         - CAST(SUM(q) AS DOUBLE) * SUM(q) / COUNT(*))
                        / (COUNT(*) - 1))
                   / (CAST(SUM(q) AS DOUBLE) / COUNT(*)) END AS cv
  FROM weekly GROUP BY pk
), xyz AS (
  SELECT pk, CASE WHEN cv < 0.5 THEN 'X' WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz
  FROM cv
), tot AS (SELECT CAST(SUM(r) AS DECIMAL(38,0)) AS tr FROM rev)
SELECT a.abc, x.xyz,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(a.r AS HUGEINT)) AS DOUBLE) / MIN(t.tr), 6)
         AS revenue_share
FROM abc a JOIN xyz x USING (pk) CROSS JOIN tot t
GROUP BY a.abc, x.xyz
ORDER BY a.abc, x.xyz
"""


@declare(
    "q_abc_xyz",
    oracle=QABC_ORACLE,
    description="ABC-XYZ inventory segmentation: revenue-Pareto classes via the chunked distributed prefix sum (no single-partition window) × weekly-demand-CV classes; per-cell part counts and revenue share (supply chain [ext])",
)
def q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.relational import partitioned_prefix_sum

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    rev = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("r")
    )
    rev = rev.localCheckpoint(eager=True)  # prefix sum + total + rollup
    # composite ascending sort key ≡ (revenue DESC, pk ASC); revenue
    # cents < 1e11 and partkey < 1e7 at any test SF → fits a long
    keyed = rev.withColumn(
        "__sk", (-F.col("r")) * F.lit(10_000_000) + F.col("pk")
    )
    cum = partitioned_prefix_sum(keyed, "__sk", "r", out_col="cum")
    tot = rev.agg(F.sum("r").cast("decimal(38,0)").alias("tr"))
    abc = cum.crossJoin(F.broadcast(tot)).select(
        "pk",
        "r",
        F.when(F.col("cum").cast("double") / F.col("tr").cast("double") <= 0.80, "A")
        .when(F.col("cum").cast("double") / F.col("tr").cast("double") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    weekly = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_trunc("week", F.col("l_shipdate")).alias("w"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    cv_expr = (
        F.when((F.count(F.lit(1)) < 2) | (F.sum("q") == 0), F.lit(0.0)).otherwise(
            F.sqrt(
                (
                    F.sum(F.col("q") * F.col("q")).cast("double")
                    - F.sum("q").cast("double") * F.sum("q") / F.count(F.lit(1))
                )
                / (F.count(F.lit(1)) - 1)
            )
            / (F.sum("q").cast("double") / F.count(F.lit(1)))
        )
    )
    xyz = weekly.groupBy("pk").agg(cv_expr.alias("cv")).select(
        "pk",
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "pk")
        .crossJoin(F.broadcast(tot))
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.round(
                F.sum("r").cast("double") / F.min("tr").cast("double"), 6
            ).alias("revenue_share"),
        )
        .orderBy("abc", "xyz")
    )


QSS_ORACLE = """
WITH daily AS (
  SELECT p.p_name AS product, CAST(l.l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), g AS (
  SELECT product, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CAST(q AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS BIGINT) AS ss
  FROM daily GROUP BY product
)
SELECT product, n_days,
       ROUND(CAST(s AS DOUBLE) / n_days, 6) AS mean_daily,
       ROUND(CASE WHEN n_days < 2 THEN 0.0
             ELSE sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
                       / (n_days - 1)) END, 6) AS sigma_daily,
       ROUND(1.645 * (CASE WHEN n_days < 2 THEN 0.0
             ELSE sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
                       / (n_days - 1)) END) * sqrt(7.0), 6) AS safety_stock,
       ROUND(CAST(s AS DOUBLE) / n_days * 7
             + 1.645 * (CASE WHEN n_days < 2 THEN 0.0
               ELSE sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_days)
                         / (n_days - 1)) END) * sqrt(7.0), 6) AS reorder_point
FROM g ORDER BY product
"""


@declare(
    "q_safety_stock",
    oracle=QSS_ORACLE,
    description="Safety stock z·σ_d·√LT (z=1.645, LT=7) and reorder point μ_d·LT+SS per product name, from exact integer daily-demand moments (supply chain [ext])",
)
def q_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    sigma = F.when(F.col("n_days") < 2, F.lit(0.0)).otherwise(
        F.sqrt(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n_days")
            )
            / (F.col("n_days") - 1)
        )
    )
    ss = F.lit(1.645) * sigma * F.sqrt(F.lit(7.0))
    return g.select(
        "product",
        "n_days",
        F.round(mean, 6).alias("mean_daily"),
        F.round(sigma, 6).alias("sigma_daily"),
        F.round(ss, 6).alias("safety_stock"),
        F.round(mean * 7 + ss, 6).alias("reorder_point"),
    ).orderBy("product")
