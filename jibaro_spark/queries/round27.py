"""Round-27 declared queries — long-memory diagnostics, portmanteau
autocorrelation testing, and precision-recall evaluation.

* ``q_hurst_rs`` — rescaled-range (R/S) Hurst exponent of daily
  revenue: for block sizes {8,16,32}, per-block range of cumulative
  deviations over per-block sd, mean ln(R/S) per size, H = 3-point
  log-log slope.  Cumulative deviations are INTEGER-cumsum minus
  j·mean (one multiply per row — no float accumulation), so every
  R/S is a deterministic double in both engines.
* ``q_ljung_box`` — portmanteau test Q = n(n+2)·Σ_{k≤5} r_k²/(n−k)
  over the per-lag Pearson autocorrelations of the daily order-count
  series (the q_autocorr_lags machinery, squared and pooled; the
  Pearson-per-lag variant is used verbatim on both engines).
* ``q_pr_auc`` — average precision (step-wise PR-AUC) of the
  md5-split per-quantity-band return-rate scorer (q_brier_calibration's
  model): distinct-score cells → cumulative precision/recall →
  Σ ΔR·P with rounded-addend decimal accumulation; the
  imbalance-robust companion of the exact ROC-AUC query.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Hurst R/S.

_HURST_SIZES = (8, 16, 32)


def _hurst_sql_branch(b: int) -> str:
    return f"""
  SELECT {b} AS b, bid,
         MAX(cx - rn * mu) - MIN(cx - rn * mu) AS r,
         sqrt((CAST(MAX(ssq) AS DOUBLE) - CAST(MAX(sx) AS DOUBLE) * MAX(sx) / {b})
              / {b}) AS s
  FROM (
    SELECT (rn0 - 1) // {b} AS bid,
           ((rn0 - 1) % {b}) + 1 AS rn,
           SUM(y) OVER (PARTITION BY (rn0 - 1) // {b} ORDER BY rn0) AS cx,
           SUM(y) OVER (PARTITION BY (rn0 - 1) // {b}) AS sx,
           SUM(CAST(y AS HUGEINT) * y) OVER (PARTITION BY (rn0 - 1) // {b}) AS ssq,
           CAST(SUM(y) OVER (PARTITION BY (rn0 - 1) // {b}) AS DOUBLE) / {b} AS mu,
           COUNT(*) OVER (PARTITION BY (rn0 - 1) // {b}) AS bn
    FROM seq
  ) WHERE bn = {b}
  GROUP BY bid"""


QHURST_ORACLE = (
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), seq AS (
  SELECT ROW_NUMBER() OVER (ORDER BY d) AS rn0, y FROM daily
), blocks AS ("""
    + "\n  UNION ALL".join(_hurst_sql_branch(b) for b in _HURST_SIZES)
    + """
), per_size AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(CAST(ROUND(ln(r / s), 10) AS DECIMAL(28,12))) AS DOUBLE)
           / COUNT(*) AS mean_ln_rs
  FROM blocks WHERE s > 0 AND r > 0
  GROUP BY b
), fit AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS np,
         SUM(ln(CAST(b AS DOUBLE))) AS sx,
         SUM(mean_ln_rs) AS sy,
         SUM(ln(CAST(b AS DOUBLE)) * mean_ln_rs) AS sxy,
         SUM(ln(CAST(b AS DOUBLE)) * ln(CAST(b AS DOUBLE))) AS sxx
  FROM per_size
)
SELECT p.b AS block_size, p.n_blocks, ROUND(p.mean_ln_rs, 6) AS mean_ln_rs,
       ROUND((f.np * f.sxy - f.sx * f.sy) / (f.np * f.sxx - f.sx * f.sx), 6)
         AS hurst
FROM per_size p CROSS JOIN fit f
ORDER BY block_size
"""
)


@declare(
    "q_hurst_rs",
    oracle=QHURST_ORACLE,
    description="Rescaled-range Hurst exponent of daily revenue: integer-cumsum cumulative deviations (no float accumulation), per-block R/S over sizes {8,16,32}, 3-point log-log slope (long-memory diagnostics [ext])",
)
def q_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): the day series needs a
    # defined date and revenue — a NULL day would shift every block
    orders = orders.filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("y")
    )
    seq = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("rn0"), "y"
    )
    seq = seq.localCheckpoint(eager=True)  # one branch per block size
    per_size = None
    for b in _HURST_SIZES:
        bid = ((F.col("rn0") - 1) / b).cast("long")
        wcum = Window.partitionBy(bid.alias("bid")).orderBy("rn0")
        # re-express: assign bid/rn as columns first
        s0 = seq.select(
            ((F.col("rn0") - 1) / b).cast("long").alias("bid"),
            ((F.col("rn0") - 1) % b + 1).alias("rn"),
            "rn0",
            "y",
        )
        wb = Window.partitionBy("bid")
        wc = Window.partitionBy("bid").orderBy("rn0")
        enriched = (
            s0.withColumn("cx", F.sum("y").over(wc))
            .withColumn("sx", F.sum("y").over(wb))
            .withColumn(
                "ssq", F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).over(wb)
            )
            .withColumn("mu", F.col("sx").cast("double") / b)
            .withColumn("bn", F.count(F.lit(1)).over(wb))
            .filter(F.col("bn") == b)
        )
        blocks = enriched.groupBy("bid").agg(
            (
                F.max(F.col("cx") - F.col("rn") * F.col("mu"))
                - F.min(F.col("cx") - F.col("rn") * F.col("mu"))
            ).alias("r"),
            F.sqrt(
                (
                    F.max("ssq").cast("double")
                    - F.max("sx").cast("double") * F.max("sx") / b
                )
                / b
            ).alias("s"),
        )
        branch = (
            blocks.filter((F.col("s") > 0) & (F.col("r") > 0))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_blocks"),
                (
                    F.sum(
                        F.round(F.log(F.col("r") / F.col("s")), 10).cast(
                            "decimal(28,12)"
                        )
                    ).cast("double")
                    / F.count(F.lit(1))
                ).alias("mean_ln_rs"),
            )
            .select(F.lit(b).alias("b"), "n_blocks", "mean_ln_rs")
        )
        per_size = branch if per_size is None else per_size.unionByName(branch)
    per_size = per_size.localCheckpoint(eager=True)  # fit + output share it
    fit = per_size.agg(
        F.count(F.lit(1)).cast("long").alias("np"),
        F.sum(F.log(F.col("b").cast("double"))).alias("sx"),
        F.sum("mean_ln_rs").alias("sy"),
        F.sum(F.log(F.col("b").cast("double")) * F.col("mean_ln_rs")).alias("sxy"),
        F.sum(
            F.log(F.col("b").cast("double")) * F.log(F.col("b").cast("double"))
        ).alias("sxx"),
    )
    return (
        per_size.crossJoin(F.broadcast(fit))
        .select(
            F.col("b").cast("long").alias("block_size"),
            "n_blocks",
            F.round("mean_ln_rs", 6).alias("mean_ln_rs"),
            F.round(
                (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy"))
                / (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")),
                6,
            ).alias("hurst"),
        )
        .orderBy("block_size")
    )


# ---------------------------------------------------------------------------
# Ljung-Box over per-lag Pearson autocorrelations (lags 1..5).

QLB_ORACLE = """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) - DATE '1970-01-01' AS dn,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1
), n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
lags AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 6)),
pairs AS (
  SELECT l.lag, CAST(a.cnt AS DECIMAL(18,0)) AS x, CAST(b.cnt AS DECIMAL(18,0)) AS y
  FROM lags l
  JOIN daily a ON TRUE
  JOIN daily b ON b.dn = a.dn + l.lag
), s AS (
  SELECT lag, COUNT(*) AS np,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy
  FROM pairs GROUP BY lag
), r AS (
  SELECT lag,
         ROUND((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / SQRT((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 10) AS rk
  FROM s
)
SELECT n_tot.n AS n_days, CAST(5 AS BIGINT) AS n_lags,
       ROUND(n_tot.n * (n_tot.n + 2.0)
             * CAST(SUM(CAST(ROUND(rk * rk / (n_tot.n - lag), 12)
                   AS DECIMAL(18,14))) AS DOUBLE), 6) AS q_stat
FROM r CROSS JOIN n_tot
GROUP BY n_tot.n
"""


@declare(
    "q_ljung_box",
    oracle=QLB_ORACLE,
    description="Ljung-Box portmanteau Q over lags 1-5 of the daily order-count series (Pearson per-lag ACF variant, rounded-addend decimal pooling) — the significance pool of q_autocorr_lags (time-series diagnostics [ext])",
)
def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dn")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    daily = daily.localCheckpoint(eager=True)  # 5 lag joins + n share it
    n_tot = daily.count()  # driver scalar: one long (series length)
    b = daily.select(F.col("dn").alias("bdn"), F.col("cnt").alias("bcnt"))
    out = None
    for lag in range(1, 6):
        pairs = daily.join(b, F.col("bdn") == F.col("dn") + lag).select(
            F.col("cnt").cast("decimal(18,0)").alias("x"),
            F.col("bcnt").cast("decimal(18,0)").alias("y"),
        )
        s = pairs.agg(
            F.count(F.lit(1)).alias("np"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        rk = F.round(
            (
                F.col("np").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / F.sqrt(
                (
                    F.col("np").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                * (
                    F.col("np").cast("double") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")
                )
            ),
            10,
        )
        branch = s.select(F.lit(lag).alias("lag"), rk.alias("rk"))
        out = branch if out is None else out.unionByName(branch)
    q = out.agg(
        F.round(
            F.lit(float(n_tot))
            * (n_tot + 2.0)
            * F.sum(
                F.round(
                    F.col("rk") * F.col("rk") / (F.lit(n_tot) - F.col("lag")), 12
                ).cast("decimal(18,14)")
            ).cast("double"),
            6,
        ).alias("q_stat")
    )
    return q.select(
        F.lit(n_tot).cast("long").alias("n_days"),
        F.lit(5).cast("long").alias("n_lags"),
        "q_stat",
    )


# ---------------------------------------------------------------------------
# PR-AUC / average precision of the band return-rate scorer.

QPR_ORACLE = """
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
         SUM(n) OVER (ORDER BY p_hat DESC) AS cn,
         SUM(pos) OVER (ORDER BY p_hat DESC) AS cpos,
         SUM(pos) OVER () AS tot_pos
  FROM cells
), steps AS (
  SELECT CAST(ROUND(
           (CAST(cpos AS DOUBLE) / tot_pos
            - CAST(COALESCE(LAG(cpos) OVER (ORDER BY p_hat DESC), 0) AS DOUBLE)
              / tot_pos)
           * (CAST(cpos AS DOUBLE) / cn), 12) AS DECIMAL(18,14)) AS a
  FROM cum
)
SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS n_test,
       (SELECT CAST(MAX(tot_pos) AS BIGINT) FROM cum) AS n_pos,
       ROUND(CAST(SUM(a) AS DOUBLE), 6) AS average_precision
FROM steps
"""


@declare(
    "q_pr_auc",
    oracle=QPR_ORACLE,
    description="Average precision (step-wise PR-AUC) of the md5-split band return-rate scorer: distinct-score cells, cumulative precision/recall, Σ ΔR·P with rounded-addend decimal pooling — the imbalance-robust companion of exact ROC-AUC (ML eval [ext])",
)
def q_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    cells = cells.localCheckpoint(eager=True)  # cum + totals share it
    wd = Window.orderBy(F.col("p_hat").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = cells.withColumn("cn", F.sum("n").over(wd)).withColumn(
        "cpos", F.sum("pos").over(wd)
    ).withColumn("tot_pos", F.sum("pos").over(Window.partitionBy()))
    wl = Window.orderBy(F.col("p_hat").desc())
    steps = cum.select(
        F.round(
            (
                F.col("cpos").cast("double") / F.col("tot_pos")
                - F.coalesce(F.lag("cpos").over(wl), F.lit(0)).cast("double")
                / F.col("tot_pos")
            )
            * (F.col("cpos").cast("double") / F.col("cn")),
            12,
        )
        .cast("decimal(18,14)")
        .alias("a")
    )
    totals = cells.agg(
        F.sum("n").cast("long").alias("n_test"),
        F.sum("pos").cast("long").alias("n_pos"),
    )
    ap = steps.agg(
        F.round(F.sum("a").cast("double"), 6).alias("average_precision")
    )
    return totals.crossJoin(F.broadcast(ap))
