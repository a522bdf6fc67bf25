"""TPC-H-ish relational declared queries (SURVEY §2.3–2.8 coverage).

These exercise the relational kernel the reference delegates to Spark
(SURVEY §2.4 note: the reference implements no standalone joins/aggs of
its own), proven against the DuckDB oracle on the driver fixtures.

Scale notes (100 TB design point) are inline per query: dimension
tables are broadcast, filters are expressed on scan columns so Catalyst
pushes them into the parquet reader, and aggregations are partial
(map-side combine) by construction of ``groupBy().agg()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import davg, declare, dsum, load_tables

_DEC = "decimal(18,4)"


def _d(col: str):
    return F.col(col).cast(_DEC)


# --------------------------------------------------------------------------
# Q1 — pricing summary (flagship: filter → groupBy → 8 aggs → sort).
# Spark plan: parquet scan with pushed l_shipdate filter + column pruning →
# partial hash agg → shuffle on 2 low-cardinality keys → final agg. No join.
# --------------------------------------------------------------------------
Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  -- product sums rescale to 4 decimals BEFORE the double cast (skew
  -- sweep r10): the decimal sums are bit-identical cross-engine, but
  -- casting a scale-8/12 decimal to double is double-rounded in DuckDB
  -- (int128→double, then ×10⁻ˢ) vs correctly rounded in the JVM — 1 ulp
  -- apart at 5e9 magnitude; at scale 4 the scaled integer fits 2^53 and
  -- both casts are exact.  ROUND (half away from zero = Spark's
  -- HALF_UP decimal rescale on this positive domain), NOT a decimal
  -- downcast, which DuckDB TRUNCATES
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4)))), 4) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@declare("q1_pricing_summary", oracle=Q1_ORACLE, description="TPC-H Q1: filter+groupBy+multi-agg+sort (A9,P4,O1)")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem")
    disc_price = _d("l_extendedprice") * (F.lit(1) - _d("l_discount"))
    charge = disc_price * (F.lit(1) + _d("l_tax"))
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            # rescale to (38,4) before the double cast — see Q1_ORACLE
            # comment (decimal→double is engine-dependent at scale > ~6)
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,4)").cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join, agg, top-10.
# customer is small → broadcast; orders⋈lineitem shuffles on o_orderkey.
# --------------------------------------------------------------------------
Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@declare("q3_shipping_priority", oracle=Q3_ORACLE, description="TPC-H Q3: broadcast dim join + fact shuffle join + top-k (J1,J2,A9)")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = _d("l_extendedprice") * (F.lit(1) - _d("l_discount"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q5-ish — revenue by nation: 5-way join with broadcast dimension chain.
# --------------------------------------------------------------------------
Q5_ORACLE = """
SELECT
  n_name,
  -- ROUND 4 before the double cast: per-nation sums reach 2e8 at sf0.1,
  -- where scale-8 decimal->double is double-rounded in DuckDB (see Q1)
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))), 4) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@declare("q5_revenue_by_nation", oracle=Q5_ORACLE, description="TPC-H Q5-ish: multi-join star query, broadcast dims (J1,J2,A9)")
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation", "region")
    revenue = _d("l_extendedprice") * (F.lit(1) - _d("l_discount"))
    asia = t["region"].filter(F.col("r_name") == "ASIA")
    dims = (
        t["nation"]
        .join(F.broadcast(asia), t["nation"].n_regionkey == asia.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    cust = (
        t["customer"]
        .join(F.broadcast(dims), t["customer"].c_nationkey == dims.n_nationkey)
        .select("c_custkey", "n_name")
    )
    return (
        t["orders"]
        .join(F.broadcast(cust), t["orders"].o_custkey == cust.c_custkey)
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# Q6 — forecast revenue: pure scan-filter-agg; everything pushes down.
# --------------------------------------------------------------------------
Q6_ORACLE = """
SELECT
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))), 4) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@declare("q6_forecast_revenue", oracle=Q6_ORACLE, description="TPC-H Q6: pushdown filter + global agg (P4,A9)")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # literals cast to timestamp_ntz to match the column type exactly
    # (UTC session tz makes LTZ equivalent, but ntz needs no conversion)
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_d("l_extendedprice") * _d("l_discount")).cast("decimal(38,4)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q4-ish — semi-join (EXISTS): orders with at least one late lineitem.
# --------------------------------------------------------------------------
Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@declare("q4_order_priority", oracle=Q4_ORACLE, description="TPC-H Q4: left-semi join / EXISTS (J1 semi)")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"].filter(
        # 1996: fixture dates span 1995-2001; a 1994 filter is vacuous
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Anti-join: customers with no orders (J1 anti).
# --------------------------------------------------------------------------
# Every fixture customer has at least one order, so the plain "no
# orders" anti-join is vacuous; anti-join against HIGH-VALUE orders
# instead (57 rows at sf0.001, 538 at sf0.01).
QANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
ORDER BY c_custkey
"""


@declare("q_customers_no_orders", oracle=QANTI_ORACLE, description="left-anti join / NOT EXISTS (J1 anti)")
def q_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 450000)
    return (
        t["customer"]
        .join(big, t["customer"].c_custkey == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Top-k per group: window ranking (W1, O4).
# --------------------------------------------------------------------------
QTOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
ORDER BY o_custkey, rn
"""


@declare("q_topk_orders_per_customer", oracle=QTOPK_ORACLE, description="top-k per group via row_number window (W1,O4)")
def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------------
# Running totals: analytic window frame (W3).
# --------------------------------------------------------------------------
QRUN_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
  LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
FROM orders
WHERE o_orderdate IS NOT NULL AND o_orderkey IS NOT NULL
ORDER BY o_custkey, o_orderdate, o_orderkey
"""


@declare("q_running_customer_spend", oracle=QRUN_ORACLE, description="running sum + lag analytic window (W3)")
def q_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): the running-total axis
    # must be defined — NULLs sort to opposite ends of the two engines
    orders = orders.filter(
        F.col("o_orderdate").isNotNull() & F.col("o_orderkey").isNotNull()
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .withColumn(
            "running_spend",
            F.sum(_d("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double"),
        )
        .withColumn("prev_orderkey", F.lag("o_orderkey").over(w))
        .drop("o_totalprice")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# ROLLUP grouping sets (A9).
# --------------------------------------------------------------------------
QROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@declare("q_rollup_qty", oracle=QROLLUP_ORACLE, description="rollup grouping sets (A9 cube/rollup)")
def q_rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity", "sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --------------------------------------------------------------------------
# Distinct + set-op union (A1, A8).
# --------------------------------------------------------------------------
QDIST_ORACLE = """
SELECT DISTINCT l_returnflag, l_linestatus
FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


@declare("q_distinct_flags", oracle=QDIST_ORACLE, description="distinct pairs (A1)")
def q_distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


QUNION_ORACLE = """
SELECT nationkey, COUNT(*) AS n_accounts,
       CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM (
  SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, s_acctbal AS acctbal FROM supplier
)
GROUP BY nationkey
ORDER BY nationkey
"""


@declare("q_union_accounts", oracle=QUNION_ORACLE, description="unionByName + agg (A8 — rebuild uses name-based union)")
def q_union_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    s = t["supplier"].select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n_accounts"), dsum("acctbal", "total_bal"))
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# Conditional / CASE WHEN (W2, F6).
# --------------------------------------------------------------------------
QCASE_ORACLE = """
SELECT
  CASE WHEN o_totalprice >= 100000 THEN 'high'
       WHEN o_totalprice >= 25000  THEN 'mid'
       ELSE 'low' END AS price_band,
  o_orderstatus,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY price_band, o_orderstatus
ORDER BY price_band, o_orderstatus
"""


@declare("q_case_price_bands", oracle=QCASE_ORACLE, description="when/otherwise conditional buckets (W2,F6)")
def q_case_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    band = (
        F.when(F.col("o_totalprice") >= 100000, "high")
        .when(F.col("o_totalprice") >= 25000, "mid")
        .otherwise("low")
    )
    return (
        orders.withColumn("price_band", band)
        .groupBy("price_band", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total"),
        )
        .orderBy("price_band", "o_orderstatus")
    )


# --------------------------------------------------------------------------
# String function palette (F9).
# --------------------------------------------------------------------------
QSTR_ORACLE = """
SELECT
  p_partkey,
  UPPER(p_brand) AS brand_upper,
  LOWER(p_type) AS type_lower,
  TRIM(p_name) AS name_trim,
  CONCAT_WS('|', p_brand, p_type) AS brand_type,
  LENGTH(p_name) AS name_len,
  REGEXP_EXTRACT(p_type, '^(\\w+)', 1) AS type_head,
  SUBSTRING(p_name, 1, 5) AS name5,
  REPLACE(p_type, ' ', '_') AS type_snake
FROM part
ORDER BY p_partkey
"""


@declare("q_string_palette", oracle=QSTR_ORACLE, description="string function palette (F9)")
def q_string_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.trim("p_name").alias("name_trim"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_head"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Date function palette (F9).
# --------------------------------------------------------------------------
QDATE_ORACLE = """
SELECT
  EXTRACT(YEAR FROM o_orderdate) AS order_year,
  EXTRACT(MONTH FROM o_orderdate) AS order_month,
  COUNT(*) AS n_orders,
  MIN(CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP)) AS month_start,
  MAX(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')) AS max_days_to_eoy
FROM orders
GROUP BY order_year, order_month
ORDER BY order_year, order_month
"""


@declare("q_date_palette", oracle=QDATE_ORACLE, description="date/time function palette (F9)")
def q_date_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.datediff(
                F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_eoy"),
        )
        .groupBy("order_year", "order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("month_start").alias("month_start"),
            F.max("days_to_eoy").alias("max_days_to_eoy"),
        )
        .orderBy("order_year", "order_month")
    )


# --------------------------------------------------------------------------
# Math palette (F9) — round/abs/floor/ceil are exact on doubles; log via
# decimal is meaningless so we round the result to 6 dp on both sides.
# --------------------------------------------------------------------------
QMATH_ORACLE = """
SELECT
  p_partkey,
  ROUND(p_retailprice, 1) AS price_r1,
  ABS(p_size - 25) AS size_dev,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
  CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
  ROUND(LN(p_retailprice), 6) AS price_ln,
  ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS size_sqrt,
  MOD(p_partkey, 7) AS key_mod7
FROM part
ORDER BY p_partkey
"""


@declare("q_math_palette", oracle=QMATH_ORACLE, description="math function palette (F9)")
def q_math_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    return part.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
        (F.col("p_partkey") % 7).alias("key_mod7"),
    ).orderBy("p_partkey")


# --------------------------------------------------------------------------
# Array palette (F9): split/explode/array_contains/transform.
# --------------------------------------------------------------------------
QARR_ORACLE = """
SELECT word, COUNT(*) AS n
FROM (SELECT UNNEST(STRING_SPLIT(p_type, ' ')) AS word FROM part)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
"""


@declare("q_array_explode_words", oracle=QARR_ORACLE, description="split + explode + agg (F9 arrays)")
def q_array_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    return (
        part.select(F.explode(F.split("p_type", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
    )


# --------------------------------------------------------------------------
# Exact distinct count (deterministic; approx variant is rows-only in llm.py).
# --------------------------------------------------------------------------
QCOUNTD_ORACLE = """
SELECT
  COUNT(DISTINCT l_orderkey) AS n_orders,
  COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_supps
FROM lineitem
"""


@declare("q_count_distinct", oracle=QCOUNTD_ORACLE, description="multi countDistinct (A9)")
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


# --------------------------------------------------------------------------
# Pivot (A9 family): return-flag counts pivoted on linestatus.
# --------------------------------------------------------------------------
QPIVOT_ORACLE = """
SELECT l_returnflag,
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_O,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@declare("q_pivot_status", oracle=QPIVOT_ORACLE, description="pivot / conditional aggregation (A9)")
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.when(F.col("l_linestatus") == "O", 1)).alias("status_O"),
            F.count(F.when(F.col("l_linestatus") == "F", 1)).alias("status_F"),
        )
        .orderBy("l_returnflag")
    )
