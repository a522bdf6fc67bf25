"""Round-26 declared queries — extreme-value fitting, frequency-domain
seasonality detection, and overdispersed count modelling.

* ``q_gumbel_fit`` — Gumbel (EV-I) fit of monthly block maxima of
  daily revenue via method of moments (β = s·√6/π,
  μ = m − γ·β with the Euler-Mascheroni literal), plus the implied
  99th-percentile return level — the distributed extreme-value-theory
  primitive (block maxima collapse first; moments are exact).
* ``q_dft_weekly_power`` — single-frequency DFT power (the Goertzel
  shape: one pass per frequency, Σ y·cos and Σ y·sin as
  rounded-addend decimal sums) of demeaned daily revenue at the
  weekly frequency vs two non-harmonic controls — frequency-domain
  seasonality detection without an FFT.
* ``q_negbin_fit`` — negative-binomial method-of-moments fit
  (r = m²/(v−m), p = m/v) of hourly arrival counts per event type —
  the count-model companion of q_fano_burstiness.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Gumbel block-maxima fit.

QGUM_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM orders GROUP BY 1
), blocks AS (
  SELECT CAST(year(d) * 12 + month(d) AS BIGINT) AS ym,
         CAST(MAX(y) AS BIGINT) AS mx
  FROM daily GROUP BY 1
), mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(mx AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(mx AS HUGEINT) * CAST(mx AS HUGEINT)) AS DECIMAL(38,0))
           AS ss
  FROM blocks
), fit AS (
  SELECT n,
         CAST(s AS DOUBLE) / n / 100 AS m,
         sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1))
           / 100 AS sd
  FROM mom
)
SELECT n AS n_blocks,
       ROUND(m, 6) AS block_mean,
       ROUND(sd * sqrt(6.0) / 3.141592653589793, 6) AS beta,
       ROUND(m - 0.5772156649015329 * (sd * sqrt(6.0) / 3.141592653589793), 6)
         AS mu,
       ROUND((m - 0.5772156649015329 * (sd * sqrt(6.0) / 3.141592653589793))
             - (sd * sqrt(6.0) / 3.141592653589793) * ln(-ln(0.99)), 6)
         AS return_level_p99
FROM fit
"""


@declare(
    "q_gumbel_fit",
    oracle=QGUM_ORACLE,
    description="Gumbel (EV-I) method-of-moments fit of monthly block maxima of daily revenue (β = s√6/π, μ = m − γβ) + the p99 return level — distributed extreme-value theory via block-maxima collapse (EVT [ext])",
)
def q_gumbel_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("y")
    )
    blocks = daily.groupBy(
        (F.year("d") * 12 + F.month("d")).cast("long").alias("ym")
    ).agg(F.max("y").cast("long").alias("mx"))
    mom = blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("mx").cast("long").alias("s"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx")).alias("ss"),
    )
    m = F.col("s").cast("double") / F.col("n") / 100
    sd = (
        F.sqrt(
            (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        )
        / 100
    )
    beta = sd * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = m - F.lit(0.5772156649015329) * beta
    return mom.select(
        F.col("n").alias("n_blocks"),
        F.round(m, 6).alias("block_mean"),
        F.round(beta, 6).alias("beta"),
        F.round(mu, 6).alias("mu"),
        F.round(mu - beta * F.log(-F.log(F.lit(0.99))), 6).alias(
            "return_level_p99"
        ),
    )


# ---------------------------------------------------------------------------
# Single-frequency DFT power at the weekly frequency + two
# non-harmonic controls.  Demeaned integer-day series; per-term
# trig values rounded to 10, products rounded to 4 and decimal-summed
# (order-free); power reported as amplitude in dollars.

_DFT_FREQS = (7, 11, 13)


def _dft_sql_branch(p: int) -> str:
    ang = f"2 * 3.141592653589793 * dn / {p}.0"
    return f"""
  SELECT '1/{p}' AS freq, {p} AS period,
         CAST(SUM(CAST(ROUND(yd * ROUND(cos({ang}), 10), 4)
              AS DECIMAL(38,6))) AS DOUBLE) AS cs,
         CAST(SUM(CAST(ROUND(yd * ROUND(sin({ang}), 10), 4)
              AS DECIMAL(38,6))) AS DOUBLE) AS sn,
         CAST(COUNT(*) AS BIGINT) AS nd
  FROM demeaned"""


QDFT_ORACLE = (
    """
WITH daily AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dn,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
  FROM orders GROUP BY 1
), mean_y AS (
  SELECT CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS m
  FROM daily
), demeaned AS (
  SELECT dn, y - m AS yd FROM daily CROSS JOIN mean_y
), branches AS ("""
    + "\n  UNION ALL".join(_dft_sql_branch(p) for p in _DFT_FREQS)
    + """
)
SELECT freq, CAST(period AS BIGINT) AS period,
       ROUND(2.0 * sqrt(cs * cs + sn * sn) / nd, 6) AS amplitude
FROM branches ORDER BY period
"""
)


@declare(
    "q_dft_weekly_power",
    oracle=QDFT_ORACLE,
    description="Single-frequency DFT amplitude (Goertzel shape — one pass, rounded-addend decimal Σy·cos/Σy·sin) of demeaned daily revenue at the weekly frequency vs two non-harmonic controls — seasonality detection without an FFT (spectral [ext])",
)
def q_dft_weekly_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("dn")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("y")
    )
    mean_y = daily.agg(
        (F.sum(F.col("y").cast("decimal(28,2)")).cast("double") / F.count(F.lit(1))).alias(
            "m"
        )
    )
    demeaned = daily.crossJoin(F.broadcast(mean_y)).select(
        "dn", (F.col("y") - F.col("m")).alias("yd")
    )
    demeaned = demeaned.localCheckpoint(eager=True)  # one branch per freq
    out = None
    for p in _DFT_FREQS:
        ang = 2 * 3.141592653589793 * F.col("dn") / float(p)
        branch = demeaned.agg(
            F.sum(
                F.round(F.col("yd") * F.round(F.cos(ang), 10), 4).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("cs"),
            F.sum(
                F.round(F.col("yd") * F.round(F.sin(ang), 10), 4).cast(
                    "decimal(38,6)"
                )
            )
            .cast("double")
            .alias("sn"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        ).select(
            F.lit(f"1/{p}").alias("freq"),
            F.lit(p).cast("long").alias("period"),
            F.round(
                2.0
                * F.sqrt(F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn"))
                / F.col("nd"),
                6,
            ).alias("amplitude"),
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("period")


# ---------------------------------------------------------------------------
# Negative-binomial method-of-moments fit per event type.

QNB_ORACLE = """
WITH hourly AS (
  SELECT event_type AS etype, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), g AS (
  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS BIGINT) AS ss
  FROM hourly GROUP BY etype
), fit AS (
  SELECT etype, n,
         CAST(s AS DOUBLE) / n AS m,
         (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1) AS v
  FROM g
)
SELECT etype, n AS n_hours, ROUND(m, 6) AS mean_count, ROUND(v, 6) AS var_count,
       CASE WHEN v > m THEN ROUND(m * m / (v - m), 6) END AS nb_r,
       CASE WHEN v > m THEN ROUND(m / v, 6) END AS nb_p,
       v > m AS overdispersed
FROM fit ORDER BY etype
"""


@declare(
    "q_negbin_fit",
    oracle=QNB_ORACLE,
    description="Negative-binomial method-of-moments fit (r = m²/(v−m), p = m/v) of hourly arrival counts per event type — the count-model companion of q_fano_burstiness (count models [ext])",
)
def q_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeline fence: no ts → no hour bucket; no type → no series
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    hourly = ev.groupBy(
        F.col("event_type").alias("etype"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    g = hourly.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    m = F.col("s").cast("double") / F.col("n")
    # try_divide: a 1-hour series has an undefined sample variance —
    # NULL (SQL's x/0), never an ANSI crash
    v = F.try_divide(
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s") / F.col("n"),
        (F.col("n") - 1).cast("double"),
    )
    return g.select(
        "etype",
        F.col("n").alias("n_hours"),
        F.round(m, 6).alias("mean_count"),
        F.round(v, 6).alias("var_count"),
        F.when(v > m, F.round(m * m / (v - m), 6)).alias("nb_r"),
        F.when(v > m, F.round(m / v, 6)).alias("nb_p"),
        (v > m).alias("overdispersed"),
    ).orderBy("etype")
