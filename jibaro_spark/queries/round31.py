"""Round-31 declared queries — scorecard lift evaluation and
multi-ranking concordance.

* ``q_decile_lift`` — the classic model lift/gains table: test rows
  scored by the md5-split band scorer, bucketed into exact type-1
  score deciles (distinct-score ECDF — scores live on the bounded
  band domain), per-decile response rate, lift vs base rate, and
  cumulative capture of positives.
* ``q_kendall_w`` — Kendall's coefficient of concordance W across
  yearly revenue rankings of nations: per-year dense ranks over the
  nation-bounded table, W = 12·S/(m²·(n³−n)) from exact integer rank
  sums (m = #years as "raters", n = #nations as "items").

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

QLIFT_ORACLE = """
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                              CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS part,
         CAST(l_quantity AS BIGINT) AS band,
         CAST(l_returnflag = 'R' AS INT) AS y
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
), model AS (
  SELECT band, ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS p_hat
  FROM s WHERE part = 0 GROUP BY band
), fallback AS (
  SELECT ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS p_glob
  FROM s WHERE part = 0
), test AS (
  SELECT COALESCE(m.p_hat, f.p_glob) AS p_hat, t.y
  FROM s t LEFT JOIN model m USING (band) CROSS JOIN fallback f
  WHERE t.part = 1
), cells AS (
  SELECT p_hat, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM test GROUP BY p_hat
), ecdf AS (
  SELECT p_hat, n, pos,
         SUM(n) OVER (ORDER BY p_hat DESC) AS cum,
         SUM(n) OVER () AS tot,
         SUM(pos) OVER () AS tot_pos
  FROM cells
), bucketed AS (
  SELECT LEAST(CAST(ceil(CAST(cum AS DOUBLE) * 10 / tot) AS BIGINT), 10)
           AS decile,
         n, pos, tot, tot_pos
  FROM ecdf
), agg AS (
  SELECT decile, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS pos,
         MIN(tot) AS tot, MIN(tot_pos) AS tot_pos
  FROM bucketed GROUP BY decile
)
SELECT decile, n, pos,
       ROUND(CAST(pos AS DOUBLE) / n, 6) AS response_rate,
       ROUND((CAST(pos AS DOUBLE) / n)
             / (CAST(tot_pos AS DOUBLE) / tot), 6) AS lift,
       ROUND(CAST(SUM(pos) OVER (ORDER BY decile) AS DOUBLE) / tot_pos, 6)
         AS cum_capture
FROM agg
ORDER BY decile
"""


@declare(
    "q_decile_lift",
    oracle=QLIFT_ORACLE,
    description="Model lift/gains table: md5-split band scorer, exact score-ECDF deciles (bounded band domain), per-decile response rate, lift vs base, cumulative positive capture (scorecard eval [ext])",
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): split key, band, and label
    # must be defined — concat_ws skips a NULL key part where SQL ||
    # propagates it (same fence as q_brier_calibration)
    li = li.filter(
        F.col("l_orderkey").isNotNull()
        & F.col("l_linenumber").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    part = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    s = li.select(
        part.alias("part"),
        F.col("l_quantity").cast("long").alias("band"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    s = s.localCheckpoint(eager=True)
    train = s.filter(F.col("part") == 0)
    model = train.groupBy("band").agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("p_hat")
    )
    fallback = train.agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("p_glob")
    )
    test = (
        s.filter(F.col("part") == 1)
        .join(F.broadcast(model), "band", "left")
        .crossJoin(F.broadcast(fallback))
        .select(F.coalesce(F.col("p_hat"), F.col("p_glob")).alias("p_hat"), "y")
    )
    cells = test.groupBy("p_hat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wd = Window.orderBy(F.col("p_hat").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    ecdf = (
        cells.withColumn("cum", F.sum("n").over(wd))
        .withColumn("tot", F.sum("n").over(wall))
        .withColumn("tot_pos", F.sum("pos").over(wall))
    )
    bucketed = ecdf.select(
        F.least(
            F.ceil(F.col("cum").cast("double") * 10 / F.col("tot")).cast("long"),
            F.lit(10),
        ).alias("decile"),
        "n",
        "pos",
        "tot",
        "tot_pos",
    )
    agg = bucketed.groupBy("decile").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("pos"),
        F.min("tot").alias("tot"),
        F.min("tot_pos").alias("tot_pos"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "decile",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("response_rate"),
        F.round(
            (F.col("pos").cast("double") / F.col("n"))
            / (F.col("tot_pos").cast("double") / F.col("tot")),
            6,
        ).alias("lift"),
        F.round(
            F.sum("pos").over(wcum).cast("double") / F.col("tot_pos"), 6
        ).alias("cum_capture"),
    ).orderBy("decile")


QKW_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nk, year(o.o_orderdate) AS y,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), ranked AS (
  SELECT nk, y, RANK() OVER (PARTITION BY y ORDER BY v DESC, nk) AS rk
  FROM rev
), m AS (SELECT CAST(COUNT(DISTINCT y) AS BIGINT) AS m FROM ranked),
n AS (SELECT CAST(COUNT(DISTINCT nk) AS BIGINT) AS n FROM ranked),
sums AS (
  SELECT nk, CAST(SUM(rk) AS BIGINT) AS ri FROM ranked GROUP BY nk
), dev AS (
  SELECT CAST(SUM(CAST((s.ri * 2 * n.n - m.m * (n.n + 1) * n.n)
               * (s.ri * 2 * n.n - m.m * (n.n + 1) * n.n) AS HUGEINT))
          AS DECIMAL(38,0)) AS s4n2
  FROM sums s CROSS JOIN m CROSS JOIN n
)
SELECT m.m AS n_years, n.n AS n_nations,
       ROUND(12.0 * (CAST(d.s4n2 AS DOUBLE) / (4.0 * n.n * n.n))
             / (CAST(m.m AS DOUBLE) * m.m * (CAST(n.n AS DOUBLE) * n.n * n.n - n.n)),
             6) AS kendall_w
FROM m CROSS JOIN n CROSS JOIN dev d
"""


@declare(
    "q_kendall_w",
    oracle=QKW_ORACLE,
    description="Kendall's coefficient of concordance W across yearly nation revenue rankings: per-year ranks over the nation-bounded table, W from exact integer rank-sum deviations (multi-rater agreement [ext])",
)
def q_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    o, c = t["orders"], t["customer"]
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"), F.year("o_orderdate").alias("y")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("v"))
    )
    w = Window.partitionBy("y").orderBy(F.col("v").desc(), F.col("nk"))
    ranked = rev.withColumn("rk", F.rank().over(w))
    ranked = ranked.localCheckpoint(eager=True)  # m/n/sums share it
    m = ranked.agg(F.countDistinct("y").cast("long").alias("m"))
    n = ranked.agg(F.countDistinct("nk").cast("long").alias("n"))
    sums = ranked.groupBy("nk").agg(F.sum("rk").cast("long").alias("ri"))
    # deviations scaled by 2n to stay integer: (2n·Ri − m·n(n+1))²
    dev = (
        sums.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(n))
        .select(
            (
                (F.col("ri") * 2 * F.col("n") - F.col("m") * (F.col("n") + 1) * F.col("n"))
                * (F.col("ri") * 2 * F.col("n") - F.col("m") * (F.col("n") + 1) * F.col("n"))
            )
            .cast("decimal(38,0)")
            .alias("d2")
        )
        .agg(F.sum("d2").alias("s4n2"))
    )
    return (
        m.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dev))
        .select(
            F.col("m").alias("n_years"),
            F.col("n").alias("n_nations"),
            F.round(
                12.0
                * (F.col("s4n2").cast("double") / (4.0 * F.col("n") * F.col("n")))
                / (
                    F.col("m").cast("double")
                    * F.col("m")
                    * (F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n"))
                ),
                6,
            ).alias("kendall_w"),
        )
    )


# ---------------------------------------------------------------------------
# Youden-J / cost threshold table: per distinct score threshold the
# confusion rates, J = TPR − FPR, and an asymmetric expected cost —
# the operating-point selector that closes the scorer-eval battery
# (AUC, AP, lift, Brier, confusion, now the threshold choice).

QYOUDEN_ORACLE = """
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                              CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS part,
         CAST(l_quantity AS BIGINT) AS band,
         CAST(l_returnflag = 'R' AS INT) AS y
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
), model AS (
  SELECT band, ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS p_hat
  FROM s WHERE part = 0 GROUP BY band
), fallback AS (
  SELECT ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS p_glob
  FROM s WHERE part = 0
), test AS (
  SELECT COALESCE(m.p_hat, f.p_glob) AS p_hat, t.y
  FROM s t LEFT JOIN model m USING (band) CROSS JOIN fallback f
  WHERE t.part = 1
), cells AS (
  SELECT p_hat, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM test GROUP BY p_hat
), cum AS (
  SELECT p_hat,
         SUM(pos) OVER (ORDER BY p_hat DESC) AS tp,
         SUM(n - pos) OVER (ORDER BY p_hat DESC) AS fp,
         SUM(pos) OVER () AS tot_pos,
         SUM(n - pos) OVER () AS tot_neg
  FROM cells
)
SELECT p_hat AS threshold,
       ROUND(CAST(tp AS DOUBLE) / tot_pos, 6) AS tpr,
       ROUND(CAST(fp AS DOUBLE) / tot_neg, 6) AS fpr,
       ROUND(CAST(tp AS DOUBLE) / tot_pos - CAST(fp AS DOUBLE) / tot_neg, 6)
         AS youden_j,
       CAST(5 * fp + 1 * (tot_pos - tp) AS BIGINT) AS exp_cost_5to1
FROM cum
ORDER BY threshold DESC
"""


@declare(
    "q_youden_threshold",
    oracle=QYOUDEN_ORACLE,
    description="Youden-J / asymmetric-cost operating-point table of the md5-split band scorer over the bounded distinct-score thresholds — the threshold selector closing the scorer-eval battery (ML eval [ext])",
)
def q_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): same fence as
    # q_brier_calibration — concat_ws vs || on a NULL split-key part
    li = li.filter(
        F.col("l_orderkey").isNotNull()
        & F.col("l_linenumber").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    part = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    s = li.select(
        part.alias("part"),
        F.col("l_quantity").cast("long").alias("band"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    s = s.localCheckpoint(eager=True)
    train = s.filter(F.col("part") == 0)
    model = train.groupBy("band").agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("p_hat")
    )
    fallback = train.agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("p_glob")
    )
    test = (
        s.filter(F.col("part") == 1)
        .join(F.broadcast(model), "band", "left")
        .crossJoin(F.broadcast(fallback))
        .select(F.coalesce(F.col("p_hat"), F.col("p_glob")).alias("p_hat"), "y")
    )
    cells = test.groupBy("p_hat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    wd = Window.orderBy(F.col("p_hat").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy()
    cum = (
        cells.withColumn("tp", F.sum("pos").over(wd))
        .withColumn("fp", F.sum(F.col("n") - F.col("pos")).over(wd))
        .withColumn("tot_pos", F.sum("pos").over(wall))
        .withColumn("tot_neg", F.sum(F.col("n") - F.col("pos")).over(wall))
    )
    tpr = F.col("tp").cast("double") / F.col("tot_pos")
    fpr = F.col("fp").cast("double") / F.col("tot_neg")
    return cum.select(
        F.col("p_hat").alias("threshold"),
        F.round(tpr, 6).alias("tpr"),
        F.round(fpr, 6).alias("fpr"),
        F.round(tpr - fpr, 6).alias("youden_j"),
        (5 * F.col("fp") + (F.col("tot_pos") - F.col("tp")))
        .cast("long")
        .alias("exp_cost_5to1"),
    ).orderBy(F.col("threshold").desc())
