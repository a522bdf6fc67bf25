"""Round-24 declared queries — tail risk, demand elasticity, survival
summaries, reliability fitting, and cohort value.

* ``q_var_cvar`` — Value-at-Risk (exact type-1 95th percentile of
  WHOLE-DOLLAR bands — the banding keeps the ECDF's distinct set
  bounded by the price DOMAIN, not the order count) and CVaR /
  expected shortfall (exact tail mean) per market segment.
* ``q_price_elasticity`` — log-log demand elasticity per returnflag:
  per-row ln's rounded to 10, moment sums decimal-accumulated,
  closed-form OLS slope.
* ``q_rmst`` — restricted mean survival time (area under the
  Kaplan-Meier curve up to τ=72 h) over the round-6d KM fixture: a
  lag-window step integral over the ≤τ-row duration table.
* ``q_weibull_fit`` — Weibull shape/scale via median-rank regression
  (Benard's approximation (i−0.3)/(n+0.4)) on the uncensored
  time-to-purchase durations: ln(−ln(1−F)) vs ln(t) closed-form OLS
  over the duration-bounded table.
* ``q_cohort_ltv`` — cumulative purchase value per user by cohort
  age: weekly first-activity cohorts, per-offset revenue over cohort
  size, decimal-exact running cumulation per cohort.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# VaR / CVaR per segment.

QVAR_ORACLE = """
WITH pts AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice) AS BIGINT) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), ecdf AS (
  SELECT seg, v,
         SUM(c) OVER (PARTITION BY seg ORDER BY v) AS cum,
         SUM(c) OVER (PARTITION BY seg) AS n
  FROM (SELECT seg, v, COUNT(*) AS c FROM pts GROUP BY seg, v)
), cut AS (
  SELECT seg, MIN(CASE WHEN cum >= CAST(ceil(0.95 * n) AS BIGINT) THEN v END)
           AS var_cents
  FROM ecdf GROUP BY seg
), tail AS (
  SELECT p.seg, CAST(COUNT(*) AS BIGINT) AS n_tail,
         CAST(SUM(CAST(p.v AS HUGEINT)) AS DECIMAL(38,0)) AS s_tail
  FROM pts p JOIN cut c USING (seg)
  WHERE p.v >= c.var_cents
  GROUP BY p.seg
)
SELECT c.seg,
       CAST(c.var_cents AS DOUBLE) AS var_95,
       ROUND(CAST(t.s_tail AS DOUBLE) / t.n_tail, 6) AS cvar_95,
       t.n_tail
FROM cut c JOIN tail t USING (seg)
ORDER BY c.seg
"""


@declare(
    "q_var_cvar",
    oracle=QVAR_ORACLE,
    description="Value-at-Risk (exact type-1 p95 of domain-bounded whole-dollar bands) and CVaR / expected shortfall (exact tail mean) of order totals per segment (tail risk [ext])",
)
def q_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    o, c = t["orders"], t["customer"]
    pts = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice")).cast("long").alias("v"),
    )
    pts = pts.localCheckpoint(eager=True)  # ECDF + tail mean share it
    cells = pts.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.partitionBy("seg").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ecdf = cells.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("seg"))
    )
    cut = ecdf.groupBy("seg").agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.95) * F.col("n")).cast("long"),
                F.col("v"),
            )
        ).alias("var_cents")
    )
    tail = (
        pts.join(F.broadcast(cut), "seg")
        .filter(F.col("v") >= F.col("var_cents"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tail"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("s_tail"),
        )
    )
    return (
        cut.join(tail, "seg")
        .select(
            "seg",
            F.col("var_cents").cast("double").alias("var_95"),
            F.round(
                F.col("s_tail").cast("double") / F.col("n_tail"), 6
            ).alias("cvar_95"),
            "n_tail",
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Log-log demand elasticity per returnflag.

QELAS_ORACLE = """
WITH xy AS (
  SELECT l_returnflag AS flag,
         ROUND(ln(l_extendedprice), 10) AS x,
         ROUND(ln(l_quantity), 10) AS y
  FROM lineitem WHERE l_extendedprice > 0 AND l_quantity > 0
), mom AS (
  SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 10) AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 8) AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,10))) AS DOUBLE) AS sxx
  FROM xy GROUP BY flag
)
SELECT flag, n,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity
FROM mom ORDER BY flag
"""


@declare(
    "q_price_elasticity",
    oracle=QELAS_ORACLE,
    description="Log-log demand elasticity per returnflag: per-row rounded ln's, decimal-accumulated moments, closed-form OLS slope (econometrics [ext])",
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    xy = li.filter(
        (F.col("l_extendedprice") > 0) & (F.col("l_quantity") > 0)
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.log(F.col("l_extendedprice")), 10).alias("x"),
        F.round(F.log(F.col("l_quantity")), 10).alias("y"),
    )
    # hash-spread the projected pairs before the log/round/decimal
    # moment agg (r12, the PCA moment-pass treatment — the map-side
    # partials otherwise run on the single-row-group scan's ONE core;
    # decimal sums of per-row-rounded terms are order-free exact)
    from jibaro_spark.operators.util import ensure_parallelism

    xy = ensure_parallelism(xy, by="x")
    mom = xy.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("x"), 10).cast("decimal(28,12)"))
        .cast("double")
        .alias("sx"),
        F.sum(F.round(F.col("y"), 10).cast("decimal(28,12)"))
        .cast("double")
        .alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 8).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxx"),
    )
    return mom.select(
        "flag",
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("elasticity"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# Restricted mean survival time: area under the KM step curve to τ=72.

QRMST_ORACLE = """
WITH first_ev AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
), first_buy AS (
  SELECT user_id, MIN(ts) AS tp FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), raw AS (
  SELECT (epoch_us(p.tp) - epoch_us(f.t0)) // 3600000000 AS h
  FROM first_ev f LEFT JOIN first_buy p USING (user_id)
), lifetimes AS (
  SELECT CASE WHEN h IS NOT NULL AND h <= 72 THEN h ELSE 72 END AS dur,
         CASE WHEN h IS NOT NULL AND h <= 72 THEN 0 ELSE 1 END AS censored
  FROM raw
), by_dur AS (
  SELECT dur, SUM(1 - censored) AS d, COUNT(*) AS leaving
  FROM lifetimes GROUP BY dur
), at_risk AS (
  SELECT dur, d, SUM(leaving) OVER (ORDER BY dur DESC) AS n
  FROM by_dur
), surv AS (
  SELECT dur,
         CASE WHEN d = n THEN 0.0
              ELSE ROUND(EXP(CAST(SUM(
                CASE WHEN d < n THEN
                  CAST(ROUND(LN(1 - d / CAST(n AS DOUBLE)), 10)
                       AS DECIMAL(18,12)) END)
                OVER (ORDER BY dur) AS DOUBLE)), 6)
         END AS s
  FROM at_risk WHERE d > 0
), steps AS (
  SELECT dur, s,
         COALESCE(LAG(dur) OVER (ORDER BY dur), 0) AS prev_dur,
         COALESCE(LAG(s) OVER (ORDER BY dur), 1.0) AS prev_s
  FROM surv
), pieces AS (
  SELECT CAST(ROUND(prev_s * (dur - prev_dur), 8) AS DECIMAL(18,10)) AS area,
         dur, s
  FROM steps
), last_piece AS (
  SELECT CAST(ROUND(s * (72 - dur), 8) AS DECIMAL(18,10)) AS area
  FROM surv ORDER BY dur DESC LIMIT 1
)
SELECT CAST(72 AS BIGINT) AS tau_hours,
       ROUND(CAST((SELECT SUM(area) FROM pieces)
             + (SELECT area FROM last_piece) AS DOUBLE), 6) AS rmst_hours
"""


@declare(
    "q_rmst",
    oracle=QRMST_ORACLE,
    description="Restricted mean survival time (area under the KM curve to τ=72h) over the time-to-first-purchase fixture — lag-window step integral on the duration-bounded table (survival [ext])",
)
def q_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    first_ev = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    first_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    h = F.expr("(unix_micros(tp) - unix_micros(t0)) div 3600000000")
    observed = h.isNotNull() & (h <= 72)
    lifetimes = first_ev.join(first_buy, "user_id", "left").select(
        F.when(observed, h).otherwise(F.lit(72)).alias("dur"),
        F.when(observed, F.lit(0)).otherwise(F.lit(1)).alias("censored"),
    )
    by_dur = lifetimes.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("censored")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    at_risk = by_dur.withColumn("n", F.sum("leaving").over(w_desc))
    term = F.when(
        F.col("d") < F.col("n"),
        F.round(F.log(1 - F.col("d") / F.col("n").cast("double")), 10).cast(
            "decimal(18,12)"
        ),
    )
    w_asc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    surv = (
        at_risk.filter(F.col("d") > 0)
        .withColumn(
            "s",
            F.when(F.col("d") == F.col("n"), F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum(term).over(w_asc).cast("double")), 6)
            ),
        )
        .select("dur", "s")
    )
    surv = surv.localCheckpoint(eager=True)  # steps + last piece share it
    w = Window.orderBy("dur")
    steps = surv.withColumn(
        "prev_dur", F.coalesce(F.lag("dur").over(w), F.lit(0))
    ).withColumn("prev_s", F.coalesce(F.lag("s").over(w), F.lit(1.0)))
    pieces = steps.select(
        F.round(F.col("prev_s") * (F.col("dur") - F.col("prev_dur")), 8)
        .cast("decimal(18,10)")
        .alias("area")
    )
    last_piece = (
        surv.orderBy(F.col("dur").desc())
        .limit(1)
        .select(
            F.round(F.col("s") * (F.lit(72) - F.col("dur")), 8)
            .cast("decimal(18,10)")
            .alias("area")
        )
    )
    total = pieces.unionByName(last_piece).agg(
        F.round(F.sum("area").cast("double"), 6).alias("rmst_hours")
    )
    return total.select(
        F.lit(72).cast("long").alias("tau_hours"), "rmst_hours"
    )


# ---------------------------------------------------------------------------
# Weibull median-rank regression over the uncensored durations.

QWEIB_ORACLE = """
WITH first_ev AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
), first_buy AS (
  SELECT user_id, MIN(ts) AS tp FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), raw AS (
  SELECT (epoch_us(p.tp) - epoch_us(f.t0)) // 3600000000 AS h
  FROM first_ev f JOIN first_buy p USING (user_id)
), ev AS (
  SELECT h AS t FROM raw WHERE h >= 1 AND h <= 72
), cells AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY t
), ranked AS (
  SELECT t, SUM(c) OVER (ORDER BY t) AS i, SUM(c) OVER () AS n
  FROM cells
), xy AS (
  SELECT ROUND(ln(CAST(t AS DOUBLE)), 10) AS x,
         ROUND(ln(-ln(1 - (i - 0.3) / (n + 0.4))), 10) AS y
  FROM ranked WHERE (i - 0.3) / (n + 0.4) < 1
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 8) AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 8) AS DECIMAL(28,10))) AS DOUBLE) AS sxx
  FROM xy
)
SELECT n AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS shape_k,
       ROUND(exp(-((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n)
                 / ((n * sxy - sx * sy) / (n * sxx - sx * sx))), 6) AS scale_lambda
FROM mom
"""


@declare(
    "q_weibull_fit",
    oracle=QWEIB_ORACLE,
    description="Weibull shape/scale via median-rank regression (Benard's approximation) on uncensored time-to-purchase durations — ln(−ln(1−F)) vs ln(t) closed-form OLS over the duration-bounded table (reliability engineering [ext])",
)
def q_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    first_ev = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    first_buy = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    h = F.expr("(unix_micros(tp) - unix_micros(t0)) div 3600000000")
    durs = (
        first_ev.join(first_buy, "user_id")
        .select(h.alias("t"))
        .filter((F.col("t") >= 1) & (F.col("t") <= 72))
    )
    cells = durs.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cells.withColumn("i", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    fr = (F.col("i") - 0.3) / (F.col("n") + 0.4)
    xy = ranked.filter(fr < 1).select(
        F.round(F.log(F.col("t").cast("double")), 10).alias("x"),
        F.round(F.log(-F.log(1 - fr)), 10).alias("y"),
    )
    mom = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(28,12)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 8).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 8).cast("decimal(28,10)"))
        .cast("double")
        .alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return mom.select(
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("shape_k"),
        F.round(F.exp(-intercept / slope), 6).alias("scale_lambda"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV: cumulative purchase value per user by cohort age.

QLTV_ORACLE = """
WITH first_ev AS (
  SELECT user_id, date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cw
  FROM events GROUP BY user_id
), csize AS (
  SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM first_ev GROUP BY cw
), rev AS (
  SELECT f.cw,
         CAST(floor(date_diff('day', f.cw,
              date_trunc('week', CAST(e.ts AS TIMESTAMP))) / 7) AS BIGINT)
           AS week_offset,
         SUM(CAST(ROUND(e.value, 6) AS DECIMAL(18,6))) AS v
  FROM events e JOIN first_ev f USING (user_id)
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
), cum AS (
  SELECT r.cw, r.week_offset, c.cohort_size,
         SUM(r.v) OVER (PARTITION BY r.cw ORDER BY r.week_offset) AS cum_v
  FROM rev r JOIN csize c USING (cw)
)
SELECT CAST(cw AS TIMESTAMP) AS cohort_week, week_offset, cohort_size,
       ROUND(CAST(cum_v AS DOUBLE) / cohort_size, 6) AS ltv_per_user
FROM cum ORDER BY cohort_week, week_offset
"""


@declare(
    "q_cohort_ltv",
    oracle=QLTV_ORACLE,
    description="Cumulative purchase value per user by cohort age (weekly first-activity cohorts): decimal-exact per-offset revenue, window cumulation over bounded offsets (product analytics [ext])",
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    first_ev = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    first_ev = first_ev.localCheckpoint(eager=True)  # size + join share it
    csize = first_ev.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first_ev, "user_id")
        .groupBy(
            "cw",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)")).alias("v"))
    )
    w = Window.partitionBy("cw").orderBy("week_offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.join(F.broadcast(csize), "cw").withColumn(
        "cum_v", F.sum("v").over(w)
    )
    return cum.select(
        F.col("cw").alias("cohort_week"),
        "week_offset",
        "cohort_size",
        F.round(F.col("cum_v").cast("double") / F.col("cohort_size"), 6).alias(
            "ltv_per_user"
        ),
    ).orderBy("cohort_week", "week_offset")
