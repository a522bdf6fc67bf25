"""Round-28 declared queries — explainability, gap decomposition, and
the confusion-matrix metric battery.

* ``q_shapley_r2`` — Shapley (LMG) decomposition of the two-regressor
  R² (spend ~ ln-price, quantity proxies): with two features the
  Shapley value is the average sequential R² gain over both
  orderings, closed-form from the correlation triple — the
  feature-attribution primitive, exact from one moment pass.
* ``q_oaxaca_gap`` — Oaxaca-Blinder two-group mean decomposition of
  the acctbal gap between BUILDING and other customers with one
  explanatory regressor (nation mean spend level): explained =
  Δx̄·β_pooled, unexplained = remainder; all from group moments.
* ``q_confusion_metrics`` — precision/recall/F1/MCC/balanced accuracy
  of the integer-exact English heuristic vs the lang label, from the
  four confusion cells of one scan.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Shapley/LMG R² decomposition for two regressors:
#   R²({1}) = r_y1², R²({2}) = r_y2²,
#   R²({1,2}) = (r_y1² + r_y2² − 2 r_y1 r_y2 r_12) / (1 − r_12²)
#   φ1 = ½·r_y1² + ½·(R²_full − r_y2²);  φ2 symmetric;  φ1+φ2 = R²_full.

QSHAP_ORACLE = """
WITH m AS (
  SELECT CAST(l_extendedprice AS DECIMAL(19,4)) AS yv,
         CAST(l_quantity AS DECIMAL(19,4)) AS x1,
         CAST(l_discount AS DECIMAL(19,4)) AS x2
  FROM lineitem
), mom AS (
  SELECT COUNT(*) AS n,
         SUM(yv) AS sy, SUM(x1) AS s1, SUM(x2) AS s2,
         SUM(yv*yv) AS syy, SUM(x1*x1) AS s11, SUM(x2*x2) AS s22,
         SUM(yv*x1) AS sy1, SUM(yv*x2) AS sy2, SUM(x1*x2) AS s12
  FROM m
), r AS (
  SELECT
    ROUND((n * CAST(sy1 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(s1 AS DOUBLE))
          / sqrt((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))), 10) AS ry1,
    ROUND((n * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(s2 AS DOUBLE))
          / sqrt((n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 10) AS ry2,
    ROUND((n * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
          / sqrt((n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                 * (n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 10) AS r12
  FROM mom
), f AS (
  SELECT ry1, ry2, r12,
         (ry1 * ry1 + ry2 * ry2 - 2 * ry1 * ry2 * r12) / (1 - r12 * r12)
           AS r2_full
  FROM r
)
SELECT ROUND(r2_full, 6) AS r2_full,
       ROUND(0.5 * ry1 * ry1 + 0.5 * (r2_full - ry2 * ry2), 6) AS shapley_qty,
       ROUND(0.5 * ry2 * ry2 + 0.5 * (r2_full - ry1 * ry1), 6) AS shapley_discount
FROM f
"""


@declare(
    "q_shapley_r2",
    oracle=QSHAP_ORACLE,
    description="Shapley (LMG) decomposition of two-regressor R² — average sequential R² gain over both orderings, closed-form from the correlation triple of one exact-moment pass; φ₁+φ₂ = R²_full (explainability [ext])",
)
def q_shapley_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    m = li.select(
        F.col("l_extendedprice").cast("decimal(19,4)").alias("yv"),
        F.col("l_quantity").cast("decimal(19,4)").alias("x1"),
        F.col("l_discount").cast("decimal(19,4)").alias("x2"),
    )
    mom = m.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yv").alias("sy"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("yv") * F.col("yv")).alias("syy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("yv") * F.col("x1")).alias("sy1"),
        F.sum(F.col("yv") * F.col("x2")).alias("sy2"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
    )

    def corr(sab, sa, sb, saa, sbb):
        n = F.col("n")
        num = n * F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double")
        den = F.sqrt(
            (
                n * F.col(saa).cast("double")
                - F.col(sa).cast("double") * F.col(sa).cast("double")
            )
            * (
                n * F.col(sbb).cast("double")
                - F.col(sb).cast("double") * F.col(sb).cast("double")
            )
        )
        return F.round(num / den, 10)

    r = mom.select(
        corr("sy1", "sy", "s1", "syy", "s11").alias("ry1"),
        corr("sy2", "sy", "s2", "syy", "s22").alias("ry2"),
        corr("s12", "s1", "s2", "s11", "s22").alias("r12"),
    )
    r2_full = (
        F.col("ry1") * F.col("ry1")
        + F.col("ry2") * F.col("ry2")
        - 2 * F.col("ry1") * F.col("ry2") * F.col("r12")
    ) / (1 - F.col("r12") * F.col("r12"))
    f = r.withColumn("r2_full", r2_full)
    return f.select(
        F.round("r2_full", 6).alias("r2_full"),
        F.round(
            0.5 * F.col("ry1") * F.col("ry1")
            + 0.5 * (F.col("r2_full") - F.col("ry2") * F.col("ry2")),
            6,
        ).alias("shapley_qty"),
        F.round(
            0.5 * F.col("ry2") * F.col("ry2")
            + 0.5 * (F.col("r2_full") - F.col("ry1") * F.col("ry1")),
            6,
        ).alias("shapley_discount"),
    )


# ---------------------------------------------------------------------------
# Oaxaca-Blinder two-group decomposition: gap = Δx̄'β_pooled (explained)
# + remainder (unexplained).  y = acctbal cents, x = the customer's
# nation-level mean order count (a group-composition regressor),
# groups = BUILDING vs rest.

QOAX_ORACLE = """
WITH cust AS (
  SELECT * FROM customer
  WHERE c_nationkey IS NOT NULL AND c_mktsegment IS NOT NULL
    AND c_acctbal IS NOT NULL
), natx AS (
  SELECT c_nationkey AS nk,
         ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT c_mktsegment), 6) AS x
  FROM cust GROUP BY c_nationkey
), pts AS (
  SELECT CAST(c.c_mktsegment = 'BUILDING' AS INT) AS grp,
         CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS y,
         n.x
  FROM cust c JOIN natx n ON n.nk = c.c_nationkey
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,10))) AS DOUBLE) AS sxx
  FROM pts
), beta AS (
  SELECT (n * sxy - sx * CAST(sy AS DOUBLE)) / (n * sxx - sx * sx) AS b
  FROM mom
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx
  FROM pts GROUP BY grp
), wide AS (
  SELECT MAX(CASE WHEN grp = 1 THEN CAST(sy AS DOUBLE) / n END) AS y1,
         MAX(CASE WHEN grp = 0 THEN CAST(sy AS DOUBLE) / n END) AS y0,
         MAX(CASE WHEN grp = 1 THEN sx / n END) AS x1,
         MAX(CASE WHEN grp = 0 THEN sx / n END) AS x0
  FROM g
)
SELECT ROUND((y1 - y0) / 100, 6) AS total_gap,
       ROUND((x1 - x0) * b.b / 100, 6) AS explained,
       ROUND(((y1 - y0) - (x1 - x0) * b.b) / 100, 6) AS unexplained
FROM wide CROSS JOIN beta b
"""


@declare(
    "q_oaxaca_gap",
    oracle=QOAX_ORACLE,
    description="Oaxaca-Blinder decomposition of the BUILDING-vs-rest acctbal gap with a pooled-β composition regressor: explained = Δx̄·β, unexplained = remainder, all from exact group moments (econometrics [ext])",
)
def q_oaxaca_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    # NULL contract (relational fuzz sweep): grp/y/regressor all need
    # defined inputs — a NULL-mktsegment nation group would make
    # COUNT(DISTINCT)=0 and divide by zero under ANSI
    cust = cust.filter(
        F.col("c_nationkey").isNotNull()
        & F.col("c_mktsegment").isNotNull()
        & F.col("c_acctbal").isNotNull()
    )
    natx = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.round(
            F.count(F.lit(1)).cast("double") / F.countDistinct("c_mktsegment"), 6
        ).alias("x")
    )
    pts = cust.join(
        F.broadcast(natx), cust["c_nationkey"] == natx["nk"]
    ).select(
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("grp"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("y"),
        "x",
    )
    pts = pts.localCheckpoint(eager=True)  # pooled beta + group means
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxx"),
    )
    beta = mom.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy").cast("double"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("b")
    )
    g = pts.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("sx"),
    )
    wide = g.agg(
        F.max(
            F.when(F.col("grp") == 1, F.col("sy").cast("double") / F.col("n"))
        ).alias("y1"),
        F.max(
            F.when(F.col("grp") == 0, F.col("sy").cast("double") / F.col("n"))
        ).alias("y0"),
        F.max(F.when(F.col("grp") == 1, F.col("sx") / F.col("n"))).alias("x1"),
        F.max(F.when(F.col("grp") == 0, F.col("sx") / F.col("n"))).alias("x0"),
    )
    return wide.crossJoin(F.broadcast(beta)).select(
        F.round((F.col("y1") - F.col("y0")) / 100, 6).alias("total_gap"),
        F.round((F.col("x1") - F.col("x0")) * F.col("b") / 100, 6).alias(
            "explained"
        ),
        F.round(
            ((F.col("y1") - F.col("y0")) - (F.col("x1") - F.col("x0")) * F.col("b"))
            / 100,
            6,
        ).alias("unexplained"),
    )


# ---------------------------------------------------------------------------
# Confusion-matrix metric battery for the English heuristic.

QCONF_ORACLE = """
WITH cells AS (
  SELECT CAST(instr(lower(text), ' the ') > 0 AS INT) AS pred,
         CAST(lang = 'en' AS INT) AS truth,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
), cm AS (
  SELECT CAST(SUM(CASE WHEN pred = 1 AND truth = 1 THEN n ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN pred = 1 AND truth = 0 THEN n ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN pred = 0 AND truth = 1 THEN n ELSE 0 END) AS BIGINT) AS fn,
         CAST(SUM(CASE WHEN pred = 0 AND truth = 0 THEN n ELSE 0 END) AS BIGINT) AS tn
  FROM cells
)
SELECT tp, fp, fn, tn,
       ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
       ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
       ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1,
       ROUND((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                    * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)), 6)
         AS mcc,
       ROUND(0.5 * (CAST(tp AS DOUBLE) / (tp + fn)
             + CAST(tn AS DOUBLE) / (tn + fp)), 6) AS balanced_accuracy
FROM cm
"""


@declare(
    "q_confusion_metrics",
    oracle=QCONF_ORACLE,
    description="Precision/recall/F1/MCC/balanced-accuracy battery of the integer-exact English heuristic vs the lang label, from the four confusion cells of one scan (ML eval [ext])",
)
def q_confusion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    cells = docs.groupBy(
        (F.instr(F.lower(F.col("text")), " the ") > 0).cast("int").alias("pred"),
        (F.col("lang") == "en").cast("int").alias("truth"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cm = cells.agg(
        F.sum(F.when((F.col("pred") == 1) & (F.col("truth") == 1), F.col("n")).otherwise(0)).cast("long").alias("tp"),
        F.sum(F.when((F.col("pred") == 1) & (F.col("truth") == 0), F.col("n")).otherwise(0)).cast("long").alias("fp"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("truth") == 1), F.col("n")).otherwise(0)).cast("long").alias("fn"),
        F.sum(F.when((F.col("pred") == 0) & (F.col("truth") == 0), F.col("n")).otherwise(0)).cast("long").alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(tp / (F.col("tp") + F.col("fp")), 6).alias("precision"),
        F.round(tp / (F.col("tp") + F.col("fn")), 6).alias("recall"),
        F.round(
            2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
        F.round(
            (tp * tn - fp * fn)
            / F.sqrt(
                (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
            ),
            6,
        ).alias("mcc"),
        F.round(
            0.5 * (tp / (F.col("tp") + F.col("fn")) + tn / (F.col("tn") + F.col("fp"))),
            6,
        ).alias("balanced_accuracy"),
    )
