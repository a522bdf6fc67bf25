"""Round-13 declared queries — bounded-state streaming heavy hitters
(batch-equivalence twin), one-pass correlation matrix, functional-
dependency audit, seasonality-adjusted robust outliers, and naive
forecast backtesting.

* ``q_space_saving_batch`` — the batch form of
  ``streaming/windows.streaming_space_saving`` (SpaceSaving top-k with
  m-bounded state across micro-batches).  With m ≥ the group's
  distinct-item count the counters are EXACT, so the twin is fully
  SQL-oracled; the bounded-m guarantees (never undercount, overcount ≤
  max_error, N/m-frequent items always tracked) and the
  cross-micro-batch state path are pinned in pytest.
* ``q_corr_matrix`` — all six pairwise Pearson correlations of four
  lineitem measures from ONE scan: a single aggregate computes every
  sufficient statistic (4 sums, 4 sums of squares, 6 cross sums) in
  exact DECIMAL/HUGEINT, then six output rows are assembled from the
  one-row moment table.
* ``q_fd_violations`` — functional-dependency audit over four
  candidate FDs: counts-first (distinct lhs→rhs pairs, then per-lhs
  rhs cardinality), one row per FD with key counts and violation rate.
* ``q_seasonal_outliers`` — day-of-week-adjusted robust outliers on
  the daily order-count series: exact type-1 (lower) medians per dow
  via distinct-value ECDF ranks, MAD of residuals with the same
  machinery, flag |residual| > 3·MAD.  Day-of-week is computed as
  ``(epoch_day + 4) % 7`` in both engines (no locale-dependent
  dayofweek()).
* ``q_backtest_naive7`` — backtest of the seasonal-naive forecast
  f(t) = y(t−7) on daily counts per priority: the forecast join is
  keyed on (priority, day−7) — correct under date gaps, unlike a
  7-ROW lag — MAE exact-integer, sMAPE from round(·,10) addends.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# SpaceSaving batch twin.  Group = day-of-week of the event timestamp
# (epoch-day arithmetic), item = event_type, order = event_id, m = 64
# ≥ the distinct event types, so the sketch is exact and the oracle is
# a plain grouped count.

QSSB_ORACLE = """
WITH e AS (
  SELECT CAST((CAST(epoch_us(ts) AS BIGINT) // 86400000000 + 4) % 7 AS VARCHAR)
           AS dow,
         event_type
  FROM events
  -- the stateful kernel drops NULL group keys and NULL items (r8
  -- NULL hardening) — the batch twin's frame must match
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT dow, event_type,
       CAST(COUNT(*) AS BIGINT) AS est_count,
       CAST(0 AS BIGINT) AS max_error
FROM e GROUP BY dow, event_type
ORDER BY dow, event_type
"""


@declare(
    "q_space_saving_batch",
    oracle=QSSB_ORACLE,
    description="SpaceSaving heavy hitters, batch-equivalence form of the m-bounded applyInPandasWithState streaming sketch — exact at m >= distinct items, so fully SQL-oracled (streaming/sketch [ext])",
)
def q_space_saving_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.streaming.windows import streaming_space_saving

    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    src = ev.select(
        F.expr("cast((unix_micros(ts) div 86400000000 + 4) % 7 as string)").alias(
            "dow"
        ),
        "event_type",
        "event_id",
    )
    out = streaming_space_saving(
        src, group_col="dow", item_col="event_type", order_col="event_id", m=64
    )
    return out.orderBy("dow", "event_type")


# ---------------------------------------------------------------------------
# One-pass pairwise correlation matrix ([ext] stats — the multi-column
# generalization of round3's decimal-exact corr): ONE aggregate over
# lineitem computes every sufficient statistic for the 4 measures
# (cents-scaled integers), and the 6 pair rows are arithmetic over
# that 1-row moment table.  At 100 TB this is the canonical
# "sufficient statistics in a single scan" profile pass — adding
# measures grows the agg width, never the scan count.

_MEAS = ["price", "qty", "disc", "tax"]
_PAIRS = [(a, b) for i, a in enumerate(_MEAS) for b in _MEAS[i + 1 :]]


def _qcm_oracle() -> str:
    sums = ",\n         ".join(
        f"SUM(CAST({m} AS HUGEINT)) AS s_{m}, "
        f"SUM(CAST({m} AS HUGEINT) * {m}) AS ss_{m}"
        for m in _MEAS
    )
    crosses = ",\n         ".join(
        f"SUM(CAST({a} AS HUGEINT) * {b}) AS sx_{a}_{b}" for a, b in _PAIRS
    )
    rows = "\n  UNION ALL\n".join(
        f"""  SELECT '{a}' AS var_a, '{b}' AS var_b, CAST(n AS BIGINT) AS n,
         ROUND(CAST(n * sx_{a}_{b} - s_{a} * s_{b} AS DOUBLE)
               / (SQRT(CAST(n * ss_{a} - s_{a} * s_{a} AS DOUBLE))
                  * SQRT(CAST(n * ss_{b} - s_{b} * s_{b} AS DOUBLE))), 6) AS corr
  FROM m"""
        for a, b in _PAIRS
    )
    return f"""
WITH b AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS disc,
         CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS tax
  FROM lineitem
), m AS (
  SELECT COUNT(*) AS n,
         {sums},
         {crosses}
  FROM b
)
{rows}
ORDER BY var_a, var_b
"""


QCM_ORACLE = _qcm_oracle()


@declare(
    "q_corr_matrix",
    oracle=QCM_ORACLE,
    description="All six pairwise Pearson correlations of four lineitem measures from ONE scan — a single aggregate of exact integer sufficient statistics (stats [ext])",
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]

    def cents(col: str):
        return (F.col(col).cast("decimal(18,2)") * 100).cast("long")

    b = li.select(
        cents("l_extendedprice").alias("price"),
        cents("l_quantity").alias("qty"),
        cents("l_discount").alias("disc"),
        cents("l_tax").alias("tax"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    aggs = [F.count(F.lit(1)).alias("n")]
    for m in _MEAS:
        aggs.append(F.sum(d(m)).alias(f"s_{m}"))
        aggs.append(F.sum(d(m) * F.col(m)).alias(f"ss_{m}"))
    for a, bb in _PAIRS:
        aggs.append(F.sum(d(a) * F.col(bb)).alias(f"sx_{a}_{bb}"))
    mom = b.agg(*aggs)
    # r12 note: a single-pass explode(array(struct…)) form of the six
    # pair rows (the adaboost pattern) ABAB-measured consistently WORSE
    # here (1.70 vs 1.13 s, steal 0%) — the six 1-row union branches
    # dedupe into one runtime exchange reuse, while the explode path
    # pays a wider final projection.  Same outcome as the reverted
    # q_item_item_cosine explode.  The union stays.
    pair_rows = []
    for a, bb in _PAIRS:
        num = (F.col("n") * F.col(f"sx_{a}_{bb}") - F.col(f"s_{a}") * F.col(f"s_{bb}")).cast(
            "double"
        )
        dena = F.sqrt(
            (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")).cast(
                "double"
            )
        )
        denb = F.sqrt(
            (F.col("n") * F.col(f"ss_{bb}") - F.col(f"s_{bb}") * F.col(f"s_{bb}")).cast(
                "double"
            )
        )
        pair_rows.append(
            mom.select(
                F.lit(a).alias("var_a"),
                F.lit(bb).alias("var_b"),
                F.col("n").cast("long").alias("n"),
                F.round(num / (dena * denb), 6).alias("corr"),
            )
        )
    out = pair_rows[0]
    for p in pair_rows[1:]:
        out = out.unionByName(p)
    return out.orderBy("var_a", "var_b")


# ---------------------------------------------------------------------------
# Functional-dependency audit ([ext] data quality — the FD side of the
# dq-expectations wing): for each candidate lhs→rhs, collapse to
# DISTINCT (lhs, rhs) pairs map-side, count rhs values per lhs key,
# report keys violating determinism.  Each FD costs two keyed aggs
# over its distinct pair table, never a row-level shuffle of the fact.

QFD_ORACLE = """
WITH fd1 AS (
  SELECT 'o_custkey->o_orderpriority' AS fd,
         COUNT(*) AS keys_total,
         SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS keys_violating
  FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS c
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL
        GROUP BY o_custkey)
), fd2 AS (
  SELECT 'o_orderkey->o_custkey',
         COUNT(*), SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
  FROM (SELECT o_orderkey, COUNT(DISTINCT o_custkey) AS c
        FROM orders
        WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        GROUP BY o_orderkey)
), fd3 AS (
  SELECT 'l_orderkey->l_returnflag',
         COUNT(*), SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
  FROM (SELECT l_orderkey, COUNT(DISTINCT l_returnflag) AS c
        FROM lineitem
        WHERE l_orderkey IS NOT NULL AND l_returnflag IS NOT NULL
        GROUP BY l_orderkey)
), fd4 AS (
  SELECT 'l_partkey->l_suppkey',
         COUNT(*), SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
  FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS c
        FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
        GROUP BY l_partkey)
), u AS (
  SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
  UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
)
SELECT fd, CAST(keys_total AS BIGINT) AS keys_total,
       CAST(keys_violating AS BIGINT) AS keys_violating,
       ROUND(CAST(keys_violating AS DOUBLE) / keys_total, 6) AS violation_rate
FROM u ORDER BY fd
"""


@declare(
    "q_fd_violations",
    oracle=QFD_ORACLE,
    description="Functional-dependency audit over four candidate FDs: distinct-pair collapse + per-key rhs cardinality, violation counts and rates (data quality [ext])",
)
def q_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")

    def audit(df: DataFrame, lhs: str, rhs: str) -> DataFrame:
        # NULL contract (relational fuzz sweep): SQL COUNT(DISTINCT rhs)
        # skips NULLs while distinct() keeps the (lhs, NULL) pair as a
        # value — audit only defined pairs, declared on both sides
        per_key = (
            df.select(lhs, rhs)
            .filter(F.col(lhs).isNotNull() & F.col(rhs).isNotNull())
            .distinct()
            .groupBy(lhs)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        return per_key.agg(
            F.lit(f"{lhs}->{rhs}").alias("fd"),
            F.count(F.lit(1)).alias("keys_total"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("keys_violating"),
        )

    u = (
        audit(t["orders"], "o_custkey", "o_orderpriority")
        .unionByName(audit(t["orders"], "o_orderkey", "o_custkey"))
        .unionByName(audit(t["lineitem"], "l_orderkey", "l_returnflag"))
        .unionByName(audit(t["lineitem"], "l_partkey", "l_suppkey"))
    )
    return u.select(
        "fd",
        F.col("keys_total").cast("long").alias("keys_total"),
        F.col("keys_violating").cast("long").alias("keys_violating"),
        F.round(
            F.col("keys_violating").cast("double") / F.col("keys_total"), 6
        ).alias("violation_rate"),
    ).orderBy("fd")


# ---------------------------------------------------------------------------
# Day-of-week-adjusted robust outliers ([ext] time series — composes
# the seasonality and MAD wings): daily order counts, exact type-1
# (lower) median per dow from distinct-count ECDF ranks, residual MAD
# with the same machinery, flag |residual| > 3·MAD.  The windowed
# passes run over (dow, distinct count value) cells — bounded by the
# count-value domain, not by days.

QSO_ORACLE = """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1
), d2 AS (
  SELECT day, cnt, (day + 4) % 7 AS dow FROM daily
), cells AS (
  SELECT dow, cnt, COUNT(*) AS k FROM d2 GROUP BY dow, cnt
), med AS (
  SELECT dow, MIN(cnt) AS med FROM (
    SELECT dow, cnt,
           SUM(k) OVER (PARTITION BY dow ORDER BY cnt) AS cum,
           SUM(k) OVER (PARTITION BY dow) AS n
    FROM cells
  ) WHERE cum >= (n + 1) // 2 GROUP BY dow
), res AS (
  SELECT d2.day, d2.dow, d2.cnt, med.med, d2.cnt - med.med AS r
  FROM d2 JOIN med ON d2.dow = med.dow
), acell AS (
  SELECT dow, ABS(r) AS a, COUNT(*) AS k FROM res GROUP BY dow, ABS(r)
), mad AS (
  SELECT dow, MIN(a) AS mad FROM (
    SELECT dow, a,
           SUM(k) OVER (PARTITION BY dow ORDER BY a) AS cum,
           SUM(k) OVER (PARTITION BY dow) AS n
    FROM acell
  ) WHERE cum >= (n + 1) // 2 GROUP BY dow
)
SELECT res.day, CAST(res.dow AS BIGINT) AS dow,
       CAST(res.cnt AS BIGINT) AS cnt,
       CAST(res.med AS BIGINT) AS expected,
       CAST(res.r AS BIGINT) AS residual
FROM res JOIN mad ON res.dow = mad.dow
WHERE ABS(res.r) > 3 * mad.mad
ORDER BY res.day
"""


@declare(
    "q_seasonal_outliers",
    oracle=QSO_ORACLE,
    description="Day-of-week-adjusted robust outliers on daily order counts: exact type-1 dow medians + residual MAD (counts-first ECDF ranks), flag |r| > 3*MAD (time series [ext])",
)
def q_seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("dow", (F.col("day") + 4) % 7)
    )

    def type1_median(df: DataFrame, val: str) -> DataFrame:
        cells = df.groupBy("dow", val).agg(F.count(F.lit(1)).alias("k"))
        cum_w = (
            Window.partitionBy("dow")
            .orderBy(val)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ecdf = cells.select(
            "dow",
            val,
            F.sum("k").over(cum_w).alias("cum"),
            F.sum("k").over(Window.partitionBy("dow")).alias("n"),
        )
        return (
            ecdf.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
            .groupBy("dow")
            .agg(F.min(val).alias("__m"))
        )

    med = type1_median(daily, "cnt").withColumnRenamed("__m", "med")
    res = daily.join(med, "dow").withColumn("r", F.col("cnt") - F.col("med"))
    mad = (
        type1_median(res.withColumn("a", F.abs(F.col("r"))), "a")
        .withColumnRenamed("__m", "mad")
    )
    return (
        res.join(mad, "dow")
        .filter(F.abs(F.col("r")) > 3 * F.col("mad"))
        .select(
            "day",
            F.col("dow").cast("long").alias("dow"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("med").cast("long").alias("expected"),
            F.col("r").cast("long").alias("residual"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive backtest ([ext] forecasting eval — closes the loop on
# the Holt/seasonality wing with an error metric): f(t) = y(t−7) on
# daily counts per priority.  The forecast is a KEYED JOIN on
# (priority, day−7) — correct when dates are missing, where a 7-ROW
# lag window silently shifts.  MAE is exact-integer; sMAPE sums
# round(·,10) addends in decimal.

QBN_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS pr,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         COUNT(*) AS y
  FROM orders GROUP BY 1, 2
), j AS (
  SELECT a.pr, a.day, a.y, f.y AS f
  FROM daily a JOIN daily f ON a.pr = f.pr AND f.day = a.day - 7
), t AS (
  SELECT pr, y, f, ABS(y - f) AS ae,
         CAST(ROUND(2.0 * ABS(y - f) / (y + f), 10) AS DECIMAL(18,12)) AS sm
  FROM j
)
SELECT pr, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(CAST(SUM(CAST(ae AS HUGEINT)) AS DOUBLE) / COUNT(*), 6) AS mae,
       ROUND(CAST(SUM(sm) AS DOUBLE) / COUNT(*), 6) AS smape
FROM t GROUP BY pr ORDER BY pr
"""


@declare(
    "q_backtest_naive7",
    oracle=QBN_ORACLE,
    description="Seasonal-naive f(t)=y(t-7) backtest per priority on daily counts: keyed day-7 join (gap-correct), exact-integer MAE, rounded-addend sMAPE (forecast eval [ext])",
)
def q_backtest_naive7(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    daily = (
        o.select(
            F.col("o_orderpriority").alias("pr"),
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .groupBy("pr", "day")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    fcast = daily.select(
        "pr", (F.col("day") + 7).alias("day"), F.col("y").alias("f")
    )
    j = daily.join(fcast, ["pr", "day"])
    t = j.select(
        "pr",
        F.abs(F.col("y") - F.col("f")).alias("ae"),
        F.round(2.0 * F.abs(F.col("y") - F.col("f")) / (F.col("y") + F.col("f")), 10)
        .cast("decimal(18,12)")
        .alias("sm"),
    )
    return (
        t.groupBy("pr")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(
                F.sum(F.col("ae").cast("decimal(38,0)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mae"),
            F.round(F.sum("sm").cast("double") / F.count(F.lit(1)), 6).alias("smape"),
        )
        .orderBy("pr")
    )
