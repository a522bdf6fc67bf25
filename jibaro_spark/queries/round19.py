"""Round-19 declared queries — time-series similarity, post-hoc
multiple comparison, and variance-homogeneity testing.

* ``q_dtw_priority_pairs`` — banded dynamic-time-warping distance
  between the daily order-count series of every priority pair
  (``operators/sequential.dtw_distance_pairs``).  DTW's DP is
  order-dependent in both indices — not SQL-expressible — so this is
  a rows-only row (no DuckDB oracle); the DP itself is pinned exactly
  against a pure-Python reference in ``tests/test_round19_ops.py``,
  and integer-valued series make the distance exactly integer.  The
  MONTHLY-grain twin ``q_dtw_monthly_pairs`` (``queries/round38.py``)
  runs the SAME kernel with a fully hash-checked DuckDB oracle (an
  anti-diagonal recursive CTE), so the operator is oracle-pinned
  end-to-end; only this daily variant's ~3,500-diagonal recursion
  depth keeps it rows-only.
* ``q_tukey_kramer`` — post-hoc pairwise comparison after ANOVA:
  the Tukey-Kramer studentized-range statistic for every nation pair
  on customer acctbal, from exact decimal moments; top-20 pairs.
  Follows ``q_anova_f`` (the omnibus test this post-hoc refines).
* ``q_brown_forsythe`` — variance-homogeneity (the ANOVA
  precondition): Brown-Forsythe = ANOVA-F on |x − group median|;
  medians are exact type-1 values from the distinct-cents ECDF, so
  every deviation is an exact integer in cents.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables


@declare(
    "q_dtw_priority_pairs",
    description="banded DTW distance between daily order-count series of every priority pair — applyInPandas DP per pair, key-domain-bounded replication; exact-integer distances pinned vs a pure-Python reference AND oracle-pinned end-to-end via the monthly twin q_dtw_monthly_pairs (time-series similarity [ext], recursion depth keeps this variant rows-only)",
)
def q_dtw_priority_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sequential import dtw_distance_pairs

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    out = dtw_distance_pairs(daily, "priority", "d", "y", band=7)
    return out.orderBy("key_a", "key_b")


# ---------------------------------------------------------------------------
# Tukey-Kramer post-hoc: q_ij = |mean_i − mean_j| / sqrt(MSW/2 ·
# (1/n_i + 1/n_j)) over nation pairs; MSW from exact decimal moments.
# The pair fan-out is #groups² (≤ 625) — hypothesis-bounded like BH.
# The significance flag compares against a FIXED literal threshold
# (3.633) so the boolean is engine-neutral; consumers substitute the
# studentized-range critical value for their (α, k, df).

QTUKEY_ORACLE = """
WITH g AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n,
         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
         SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2)))
           AS ss
  FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 2
), msw AS (
  SELECT CAST(SUM(CAST(n AS HUGEINT) - 1) AS BIGINT) AS dfw,
         CAST(SUM(CAST(ROUND(CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n, 6)
               AS DECIMAL(28,8))) AS DOUBLE) AS ssw
  FROM g
), pairs AS (
  SELECT a.nk AS nation_a, b.nk AS nation_b,
         ROUND(abs(CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n)
               / sqrt((m.ssw / m.dfw) / 2.0
                      * (1.0 / a.n + 1.0 / b.n)), 6) AS q_stat
  FROM g a JOIN g b ON a.nk < b.nk CROSS JOIN msw m
)
SELECT CAST(nation_a AS BIGINT) AS nation_a,
       CAST(nation_b AS BIGINT) AS nation_b,
       q_stat,
       q_stat > 3.633 AS significant
FROM pairs
ORDER BY q_stat DESC, nation_a, nation_b
LIMIT 20
"""


@declare(
    "q_tukey_kramer",
    oracle=QTUKEY_ORACLE,
    description="Tukey-Kramer post-hoc studentized-range statistics for every nation pair on acctbal (exact decimal moments, hypothesis-bounded pair fan-out, fixed published critical value) — the pairwise refinement of q_anova_f (multiple comparison [ext])",
)
def q_tukey_kramer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    g = (
        cust.groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(bal).alias("s"),
            F.sum(bal * bal).alias("ss"),
        )
        .filter(F.col("n") >= 2)
    )
    g = g.localCheckpoint(eager=True)  # MSW + both pair sides share it
    ssw_term = F.round(
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n"),
        6,
    ).cast("decimal(28,8)")
    msw = g.agg(
        F.sum(F.col("n") - 1).cast("long").alias("dfw"),
        F.sum(ssw_term).cast("double").alias("ssw"),
    )
    a = g.select(
        F.col("nk").alias("nation_a"),
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
    )
    b = g.select(
        F.col("nk").alias("nation_b"),
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
    )
    pairs = (
        a.join(b, F.col("nation_a") < F.col("nation_b"))
        .crossJoin(F.broadcast(msw))
        .select(
            F.col("nation_a").cast("long").alias("nation_a"),
            F.col("nation_b").cast("long").alias("nation_b"),
            F.round(
                F.abs(
                    F.col("sa").cast("double") / F.col("na")
                    - F.col("sb").cast("double") / F.col("nb")
                )
                / F.sqrt(
                    (F.col("ssw") / F.col("dfw"))
                    / 2.0
                    * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
                ),
                6,
            ).alias("q_stat"),
        )
    )
    return (
        pairs.withColumn("significant", F.col("q_stat") > 3.633)
        .orderBy(F.col("q_stat").desc(), "nation_a", "nation_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Brown-Forsythe variance-homogeneity test: ANOVA-F on z = |x − med_g|
# across market segments.  Medians are exact type-1 distinct-cents
# ECDF values, so z is an exact integer in cents; the F statistic
# then assembles from integer/decimal-exact moments only.

QBF_ORACLE = """
WITH pts AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v
  FROM customer
), cells AS (
  SELECT seg, v, COUNT(*) AS c FROM pts GROUP BY seg, v
), ecdf AS (
  SELECT seg, v,
         SUM(c) OVER (PARTITION BY seg ORDER BY v) AS cum,
         SUM(c) OVER (PARTITION BY seg) AS n
  FROM cells
), med AS (
  SELECT seg, MIN(CASE WHEN cum * 2 >= n THEN v END) AS med
  FROM ecdf GROUP BY seg
), z AS (
  SELECT p.seg, abs(p.v - m.med) AS z
  FROM pts p JOIN med m USING (seg)
), g AS (
  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(z AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS BIGINT) AS ss
  FROM z GROUP BY seg
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(CAST(s AS HUGEINT)) AS BIGINT) AS st,
         CAST(SUM(CAST(ss AS HUGEINT)) AS BIGINT) AS sst,
         CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * s / n, 6) AS DECIMAL(28,8)))
              AS DOUBLE) AS sum_sq_over_n
  FROM g
)
SELECT k AS n_groups, nn AS n_rows,
       ROUND((sum_sq_over_n - CAST(st AS DOUBLE) * st / nn) / (k - 1)
             / ((CAST(sst AS DOUBLE) - sum_sq_over_n) / (nn - k)), 6)
         AS bf_stat
FROM tot
"""


@declare(
    "q_brown_forsythe",
    oracle=QBF_ORACLE,
    description="Brown-Forsythe variance-homogeneity test across market segments: ANOVA-F on |x − group median| with exact type-1 cents medians (counts-first ECDF) so every deviation is integer — the precondition check for q_anova_f (stats [ext])",
)
def q_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    pts = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("v"),
    )
    pts = pts.localCheckpoint(eager=True)  # median ECDF + z share it
    cells = pts.groupBy("seg", "v").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        Window.partitionBy("seg").orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
    )
    wall = Window.partitionBy("seg")
    ecdf = cells.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    med = ecdf.groupBy("seg").agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))).alias("med")
    )
    z = pts.join(F.broadcast(med), "seg").select(
        "seg", F.abs(F.col("v") - F.col("med")).alias("z")
    )
    g = z.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("long").alias("s"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("ss"),
    )
    sq_over_n = F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n"), 6
    ).cast("decimal(28,8)")
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("st"),
        F.sum("ss").cast("long").alias("sst"),
        F.sum(sq_over_n).cast("double").alias("sum_sq_over_n"),
    )
    return tot.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        F.round(
            (F.col("sum_sq_over_n") - F.col("st").cast("double") * F.col("st") / F.col("nn"))
            / (F.col("k") - 1)
            / (
                (F.col("sst").cast("double") - F.col("sum_sq_over_n"))
                / (F.col("nn") - F.col("k"))
            ),
            6,
        ).alias("bf_stat"),
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (m=7) of per-type daily
# event value — the seasonal completion of q_holt_forecast.  α=1/2,
# β=γ=1/4 are exact binary fractions and the seasonal state is a
# rotating list, so the recursive-CTE replay is bit-identical to the
# operator's Arrow-batched recurrence (q_holt_forecast's discipline).

QHW_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type AS etype, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT etype, date_diff('day', DATE '1970-01-01', d) AS dn, x,
         ROW_NUMBER() OVER (PARTITION BY etype ORDER BY d) AS rn
  FROM daily
), rec AS (
  SELECT etype, dn, rn, x, CAST(x AS DOUBLE) AS level,
         CAST(0.0 AS DOUBLE) AS trend, CAST(0.0 AS DOUBLE) AS s_cur,
         CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS seas
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.etype, s.dn, s.rn, s.x,
         0.5 * (s.x - r.seas[1]) + 0.5 * (r.level + r.trend),
         0.25 * ((0.5 * (s.x - r.seas[1]) + 0.5 * (r.level + r.trend))
                 - r.level) + 0.75 * r.trend,
         0.25 * (s.x - (0.5 * (s.x - r.seas[1])
                        + 0.5 * (r.level + r.trend))) + 0.75 * r.seas[1],
         r.seas[2:] || [0.25 * (s.x - (0.5 * (s.x - r.seas[1])
                        + 0.5 * (r.level + r.trend))) + 0.75 * r.seas[1]]
  FROM rec r JOIN seq s ON s.etype = r.etype AND s.rn = r.rn + 1
)
-- floor(x*1e6 + 0.5)/1e6, not ROUND(x, 6): with binary-fraction α/β/γ
-- the state values land EXACTLY on half boundaries at scale 6 (skew
-- sweep r10 found level = …2190625), where Spark's shortest-decimal
-- HALF_UP and DuckDB's binary-value round disagree by 1e-6; the floor
-- form computes on the identical doubles in both engines
SELECT etype, CAST(dn AS BIGINT) AS dn,
       floor(x * 1000000 + 0.5) / 1000000 AS x,
       floor(level * 1000000 + 0.5) / 1000000 AS level,
       floor(trend * 1000000 + 0.5) / 1000000 AS trend,
       floor(s_cur * 1000000 + 0.5) / 1000000 AS s_cur
FROM rec ORDER BY etype, dn
"""


@declare(
    "q_holt_winters",
    oracle=QHW_ORACLE,
    description="Holt-Winters additive seasonal smoothing (m=7, α=1/2, β=γ=1/4) of per-type daily event value — rotating-list seasonal state, bit-identical to the recursive-CTE replay (forecasting [ext])",
)
def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sequential import holt_winters

    ev = load_tables(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        F.col("event_type").alias("etype"), F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("value"), 6).cast("decimal(18,6)"))
        .cast("double")
        .alias("x")
    )
    daily = daily.select(
        "etype", F.datediff(F.col("d"), F.lit("1970-01-01").cast("date")).alias("dn"), "x"
    )
    out = holt_winters(daily, keys=["etype"], order_by=["dn"], value_col="x", period=7)

    # tie-deterministic half-up on the binary value (see QHW_ORACLE
    # comment): F.round's shortest-decimal HALF_UP diverges from the
    # oracle at exact half boundaries, which binary-fraction smoothing
    # constants actually produce
    def rnd6(c: str):
        return F.floor(F.col(c) * 1e6 + F.lit(0.5)) / F.lit(1e6)

    return out.select(
        "etype",
        F.col("dn").cast("long").alias("dn"),
        rnd6("x").alias("x"),
        rnd6("level").alias("level"),
        rnd6("trend").alias("trend"),
        rnd6("s_cur").alias("s_cur"),
    ).orderBy("etype", "dn")
