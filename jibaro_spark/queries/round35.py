"""Round-35 declared queries — statistical process control.

* ``q_process_capability`` — Cp / Cpk / Pp-style capability indices of
  lineitem quantity per linestatus against fixed spec limits
  [LSL=1, USL=50], from exact integer moments.
* ``q_xbar_r_chart`` — X-bar/R control chart over weekly subgroups of
  daily order counts: subgroup means and ranges, center lines, and
  the classic A2/D3/D4 control limits (n=5 constants as literals),
  plus the out-of-control subgroup count — the streaming-friendly
  SPC shape (subgroup stats are one keyed agg).

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QCPK_ORACLE = """
WITH g AS (
  SELECT l_linestatus AS status, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS ss
  FROM lineitem GROUP BY l_linestatus
), fit AS (
  SELECT status, n, CAST(s AS DOUBLE) / n AS mu,
         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)) AS sd
  FROM g
)
SELECT status, n, ROUND(mu, 6) AS mean_qty, ROUND(sd, 6) AS sd_qty,
       ROUND((50.0 - 1.0) / (6 * sd), 6) AS cp,
       ROUND(LEAST((50.0 - mu) / (3 * sd), (mu - 1.0) / (3 * sd)), 6) AS cpk
FROM fit ORDER BY status
"""


@declare(
    "q_process_capability",
    oracle=QCPK_ORACLE,
    description="Process capability Cp/Cpk of quantity per linestatus against fixed spec limits [1, 50], exact integer moments (SPC [ext])",
)
def q_process_capability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    q = F.col("l_quantity").cast("long")
    g = li.groupBy(F.col("l_linestatus").alias("status")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q).cast("long").alias("s"),
        F.sum(q * q).cast("long").alias("ss"),
    )
    mu = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return g.select(
        "status",
        "n",
        F.round(mu, 6).alias("mean_qty"),
        F.round(sd, 6).alias("sd_qty"),
        F.round((F.lit(50.0) - 1.0) / (6 * sd), 6).alias("cp"),
        F.round(
            F.least((F.lit(50.0) - mu) / (3 * sd), (mu - F.lit(1.0)) / (3 * sd)), 6
        ).alias("cpk"),
    ).orderBy("status")


# A2/D3/D4 for subgroup size n=5 (published Shewhart constants).
_A2, _D3, _D4 = 0.577, 0.0, 2.114

QXBAR_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
), sub AS (
  SELECT date_diff('day', DATE '1970-01-01', d) // 5 AS grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS s,
         CAST(MAX(y) - MIN(y) AS BIGINT) AS r
  FROM daily GROUP BY 1
  HAVING COUNT(*) = 5
), lines AS (
  SELECT CAST(SUM(CAST(s AS DECIMAL(28,0))) AS DOUBLE) / SUM(n) AS xbar_bar,
         CAST(SUM(CAST(r AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS r_bar,
         CAST(COUNT(*) AS BIGINT) AS n_subgroups
  FROM sub
), lim AS (
  SELECT n_subgroups, xbar_bar, r_bar,
         xbar_bar + {_A2} * r_bar AS ucl_x, xbar_bar - {_A2} * r_bar AS lcl_x,
         {_D4} * r_bar AS ucl_r, {_D3} * r_bar AS lcl_r
  FROM lines
)
SELECT l.n_subgroups,
       ROUND(l.xbar_bar, 6) AS xbar_bar, ROUND(l.r_bar, 6) AS r_bar,
       ROUND(l.ucl_x, 6) AS ucl_x, ROUND(l.lcl_x, 6) AS lcl_x,
       ROUND(l.ucl_r, 6) AS ucl_r,
       CAST(SUM(CASE WHEN CAST(s.s AS DOUBLE) / s.n > l.ucl_x
                  OR CAST(s.s AS DOUBLE) / s.n < l.lcl_x THEN 1 ELSE 0 END)
            AS BIGINT) AS n_out_of_control_x,
       CAST(SUM(CASE WHEN CAST(s.r AS DOUBLE) > l.ucl_r THEN 1 ELSE 0 END)
            AS BIGINT) AS n_out_of_control_r
FROM sub s CROSS JOIN lim l
GROUP BY l.n_subgroups, l.xbar_bar, l.r_bar, l.ucl_x, l.lcl_x, l.ucl_r
"""


@declare(
    "q_xbar_r_chart",
    oracle=QXBAR_ORACLE,
    description="X-bar/R control chart over 5-day subgroups of daily order counts: center lines, A2/D3/D4 limits (published n=5 constants), out-of-control counts — Shewhart SPC from two keyed aggs (SPC [ext])",
)
def q_xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    grp = (
        F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")) / 5
    ).cast("long")
    sub = (
        daily.groupBy(grp.alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("s"),
            (F.max("y") - F.min("y")).cast("long").alias("r"),
        )
        .filter(F.col("n") == 5)
    )
    sub = sub.localCheckpoint(eager=True)  # lines + flags share it
    lines = sub.agg(
        (F.sum(F.col("s").cast("decimal(28,0)")).cast("double") / F.sum("n")).alias(
            "xbar_bar"
        ),
        (
            F.sum(F.col("r").cast("decimal(28,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("r_bar"),
        F.count(F.lit(1)).cast("long").alias("n_subgroups"),
    )
    lim = lines.select(
        "n_subgroups",
        "xbar_bar",
        "r_bar",
        (F.col("xbar_bar") + _A2 * F.col("r_bar")).alias("ucl_x"),
        (F.col("xbar_bar") - _A2 * F.col("r_bar")).alias("lcl_x"),
        (F.lit(_D4) * F.col("r_bar")).alias("ucl_r"),
    )
    joined = sub.crossJoin(F.broadcast(lim))
    xmean = F.col("s").cast("double") / F.col("n")
    return joined.groupBy(
        "n_subgroups", "xbar_bar", "r_bar", "ucl_x", "lcl_x", "ucl_r"
    ).agg(
        F.sum(
            ((xmean > F.col("ucl_x")) | (xmean < F.col("lcl_x"))).cast("int")
        )
        .cast("long")
        .alias("n_out_of_control_x"),
        F.sum((F.col("r").cast("double") > F.col("ucl_r")).cast("int"))
        .cast("long")
        .alias("n_out_of_control_r"),
    ).select(
        "n_subgroups",
        F.round("xbar_bar", 6).alias("xbar_bar"),
        F.round("r_bar", 6).alias("r_bar"),
        F.round("ucl_x", 6).alias("ucl_x"),
        F.round("lcl_x", 6).alias("lcl_x"),
        F.round("ucl_r", 6).alias("ucl_r"),
        "n_out_of_control_x",
        "n_out_of_control_r",
    )
