"""Round-22 declared queries — nonparametric trend/randomness tests,
arrival burstiness, and aggregate-aware routing.

* ``q_mann_kendall`` — the Mann-Kendall trend test on monthly order
  counts per priority: S = Σ_{i<j} sign(x_j − x_i) over the
  month-domain-bounded pair fan-out, tie-corrected variance, Z with
  the ±1 continuity correction.  The significance companion of
  q_theil_sen (slope) and q_cochran_armitage (proportions).
* ``q_runs_test`` — Wald-Wolfowitz runs test of daily revenue (in
  exact integer cents — near-unique values, so the vs-median signs
  are non-degenerate at every SF) against its exact type-1 median:
  runs counted by a lag window over the day-grain series, Z from
  integer n1/n2.
* ``q_fano_burstiness`` — Fano factor (variance/mean of hourly
  arrival counts) and the Kim-Jo burstiness coefficient
  (σ−μ)/(σ+μ) per event type — the overdispersion diagnostics for
  arrival processes.
* ``q_agg_navigator`` — aggregate-aware routing
  (``operators/relational.aggregate_navigator``): the query asks for
  a (returnflag) rollup, the navigator answers it from the SMALLEST
  covering pre-aggregated summary (a (returnflag, linestatus)
  rollup), never touching the fact; the oracle always computes from
  the fact, so a hash match proves routing transparency.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Mann-Kendall.  Monthly grain keeps the pair fan-out month²-bounded.
# Var(S) = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18 over tie groups t.

QMK_ORACLE = """
WITH monthly AS (
  SELECT o_orderpriority AS priority,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM orders GROUP BY 1, 2
), s AS (
  SELECT a.priority,
         CAST(SUM(CASE WHEN b.x > a.x THEN 1
                       WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM monthly a JOIN monthly b
    ON a.priority = b.priority AND b.ym > a.ym
  GROUP BY a.priority
), n AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS n FROM monthly GROUP BY priority
), ties AS (
  SELECT priority,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
  FROM (
    SELECT priority, x, CAST(COUNT(*) AS BIGINT) AS t
    FROM monthly GROUP BY priority, x HAVING COUNT(*) > 1
  ) GROUP BY priority
), v AS (
  SELECT n.priority, n.n, COALESCE(t.tie_term, 0) AS tie_term,
         (CAST(n.n AS DOUBLE) * (n.n - 1) * (2 * n.n + 5)
          - COALESCE(t.tie_term, 0)) / 18.0 AS var_s
  FROM n LEFT JOIN ties t USING (priority)
)
SELECT s.priority, v.n AS n_months, s.s_stat, ROUND(v.var_s, 6) AS var_s,
       ROUND(CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1) / sqrt(v.var_s)
                  WHEN s.s_stat < 0 THEN (s.s_stat + 1) / sqrt(v.var_s)
                  ELSE 0.0 END, 6) AS z
FROM s JOIN v ON v.priority = s.priority
ORDER BY s.priority
"""


@declare(
    "q_mann_kendall",
    oracle=QMK_ORACLE,
    description="Mann-Kendall trend test on monthly order counts per priority: month²-bounded sign-pair fan-out, tie-corrected variance, continuity-corrected Z — the significance companion of Theil-Sen (nonparametric trend [ext])",
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    monthly = monthly.localCheckpoint(eager=True)  # pairs + n + ties share it
    b = monthly.select(
        F.col("priority"), F.col("ym").alias("bym"), F.col("x").alias("bx")
    )
    s = (
        monthly.join(b, "priority")
        .filter(F.col("bym") > F.col("ym"))
        .groupBy("priority")
        .agg(
            F.sum(
                F.when(F.col("bx") > F.col("x"), 1)
                .when(F.col("bx") < F.col("x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    n = monthly.groupBy("priority").agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        monthly.groupBy("priority", "x")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .groupBy("priority")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    v = n.join(ties, "priority", "left").select(
        "priority",
        "n",
        (
            (
                F.col("n").cast("double") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            )
            / 18.0
        ).alias("var_s"),
    )
    z = (
        F.when(
            F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(F.col("var_s"))
        )
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")))
        .otherwise(0.0)
    )
    return (
        s.join(v, "priority")
        .select(
            "priority",
            F.col("n").alias("n_months"),
            "s_stat",
            F.round("var_s", 6).alias("var_s"),
            F.round(z, 6).alias("z"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test on daily revenue cents vs the exact median.

QRUNS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), med AS (
  SELECT MIN(CASE WHEN cum * 2 >= n THEN v END) AS med
  FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS n
        FROM (SELECT y AS v, COUNT(*) AS c FROM daily GROUP BY y))
), signs AS (
  SELECT d.d, CAST(d.y > m.med AS INT) AS sgn
  FROM daily d CROSS JOIN med m
  WHERE d.y <> m.med
), runs AS (
  SELECT sgn,
         CASE WHEN LAG(sgn) OVER (ORDER BY d) IS NULL
                OR LAG(sgn) OVER (ORDER BY d) <> sgn THEN 1 ELSE 0 END AS brk
  FROM signs
), agg AS (
  SELECT CAST(SUM(brk) AS BIGINT) AS r,
         CAST(SUM(sgn) AS BIGINT) AS n1,
         CAST(SUM(1 - sgn) AS BIGINT) AS n2
  FROM runs
)
SELECT r AS n_runs, n1, n2,
       ROUND(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS mu,
       ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2) * (n1 + n2 - 1))),
             6) AS z
FROM agg
"""


@declare(
    "q_runs_test",
    oracle=QRUNS_ORACLE,
    description="Wald-Wolfowitz runs test of daily revenue (exact cents) vs its exact type-1 median: lag-window run breaks over the day-grain series, Z from integer n1/n2 (randomness diagnostics [ext])",
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): the day-grain series needs
    # a defined date and revenue — a NULL day sorts to opposite ends of
    # the two engines' lag axes
    orders = orders.filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("y")
    )
    daily = daily.localCheckpoint(eager=True)  # median ECDF + signs share it
    cells = daily.groupBy(F.col("y").alias("v")).agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = cells.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    med = ecdf.agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))).alias("med")
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("y") != F.col("med"))
        .select("d", (F.col("y") > F.col("med")).cast("int").alias("sgn"))
    )
    w = Window.orderBy("d")
    runs = signs.withColumn(
        "brk",
        F.when(
            F.lag("sgn").over(w).isNull() | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        ).otherwise(0),
    )
    agg = runs.agg(
        F.sum("brk").cast("long").alias("r"),
        F.sum("sgn").cast("long").alias("n1"),
        F.sum(F.lit(1) - F.col("sgn")).cast("long").alias("n2"),
    )
    nn = F.col("n1") + F.col("n2")
    mu = 2.0 * F.col("n1") * F.col("n2") / nn + 1
    sig = F.sqrt(
        2.0
        * F.col("n1")
        * F.col("n2")
        * (2.0 * F.col("n1") * F.col("n2") - F.col("n1") - F.col("n2"))
        / (nn.cast("double") * nn * (nn - 1))
    )
    return agg.select(
        F.col("r").alias("n_runs"),
        "n1",
        "n2",
        F.round(mu, 6).alias("mu"),
        F.round((F.col("r") - mu) / sig, 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# Fano factor / burstiness of hourly event arrivals per type.

QFANO_ORACLE = """
WITH hourly AS (
  SELECT event_type AS etype, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), g AS (
  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS BIGINT) AS ss
  FROM hourly GROUP BY etype
)
SELECT etype, n AS n_hours,
       ROUND(CAST(s AS DOUBLE) / n, 6) AS mean_rate,
       ROUND(((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
             / (CAST(s AS DOUBLE) / n), 6) AS fano,
       ROUND((sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
              - CAST(s AS DOUBLE) / n)
             / (sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n)
                + CAST(s AS DOUBLE) / n), 6) AS burstiness
FROM g ORDER BY etype
"""


@declare(
    "q_fano_burstiness",
    oracle=QFANO_ORACLE,
    description="Fano factor (variance/mean of hourly arrival counts) and Kim-Jo burstiness (σ−μ)/(σ+μ) per event type — overdispersion diagnostics from one integer-moment pass (arrival processes [ext])",
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    hourly = ev.groupBy(
        F.col("event_type").alias("etype"),
        F.date_trunc("hour", F.col("ts")).alias("h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    g = hourly.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")) / F.col("n")
    sd = F.sqrt(var)
    return g.select(
        "etype",
        F.col("n").alias("n_hours"),
        F.round(mean, 6).alias("mean_rate"),
        F.round(var / mean, 6).alias("fano"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness"),
    ).orderBy("etype")


# ---------------------------------------------------------------------------
# Aggregate-aware routing.  The Spark side answers the (returnflag)
# rollup from a (returnflag, linestatus) summary via the navigator —
# the fact is never re-aggregated.  The oracle computes from the fact
# directly: a hash match IS the routing-transparency proof.

QNAV_ORACLE = """
SELECT l_returnflag AS returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY returnflag
"""


@declare(
    "q_agg_navigator",
    oracle=QNAV_ORACLE,
    description="Aggregate-aware routing: the (returnflag) rollup is answered from the smallest covering (returnflag, linestatus) summary via operators/relational.aggregate_navigator — the oracle computes from the fact, so the hash match proves routing transparency (warehouse MV rewrite [ext])",
)
def q_agg_navigator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.relational import aggregate_navigator

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    fact = li.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("l_linestatus").alias("linestatus"),
        F.col("l_quantity").cast("decimal(18,2)").alias("sum_qty"),
    )
    # the pre-aggregated summaries a warehouse would maintain (the
    # fine one covers the request; the coarse one does not)
    summary_fine = fact.groupBy("returnflag", "linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sum_qty").alias("sum_qty"),
    )
    summary_other = fact.groupBy("linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sum_qty").alias("sum_qty"),
    )
    routed = aggregate_navigator(
        fact,
        [
            (["returnflag", "linestatus"], summary_fine),
            (["linestatus"], summary_other),
        ],
        keys=["returnflag"],
        measures={"n_items": "count", "sum_qty": "sum"},
    )
    return routed.select(
        "returnflag",
        F.col("n_items").cast("long").alias("n_items"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
    ).orderBy("returnflag")
