"""Second tranche of TPC-H-derived declared queries (SURVEY §2.4-2.8).

Adaptations to the driver fixtures (TESTDATA.md): no ``partsupp``
table (the Q2/Q9/Q11/Q16/Q20/Q21 family is covered shape-for-shape in
:mod:`jibaro_spark.queries.tpch3` via observed supply pairs), no
``c_phone``/``o_comment``
columns, single-word ``p_type`` values, ``NATION_n`` nation names, and
dates spanning 1995-2001.  Each query keeps the original's join/agg
shape — that is what exercises the engine.

Scale notes inline: nation/region are broadcast everywhere; fact-fact
joins shuffle on their keys; every aggregate is partial-first by
construction of ``groupBy().agg()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, dsum, load_tables

_DEC = "decimal(18,4)"


def _d(col: str):
    return F.col(col).cast(_DEC)


def _revenue():
    return _d("l_extendedprice") * (F.lit(1) - _d("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year.  lineitem joins
# orders/customer/supplier; the two nation dims broadcast; the yearly
# rollup is a 4-key partial agg.
# --------------------------------------------------------------------------
Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND(SUM({_REV_SQL}), 4) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@declare(
    "q7_volume_shipping",
    oracle=Q7_ORACLE,
    description="TPC-H Q7: dual-aliased dim join + 3-fact chain + yearly rollup (J1,J2,A9,F9 date)",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = t["lineitem"].filter(
        F.col("l_shipdate").between("1995-01-01", "1996-12-31")
    )
    joined = (
        li.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(
                t["supplier"].join(n1, F.col("s_nationkey") == F.col("n1_key"))
            ).select("s_suppkey", "supp_nation"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(
                t["customer"].join(n2, F.col("c_nationkey") == F.col("n2_key"))
            ).select("c_custkey", "cust_nation"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("decimal(38,4)").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 — market share of one supplier nation inside one region's market
# for one part type, by order year.  Conditional aggregation
# (sum(case)/sum) over a 6-way join.
# --------------------------------------------------------------------------
Q8_ORACLE = f"""
WITH all_nations AS (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         {_REV_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    AND p_type = 'STANDARD'
)
SELECT o_year,
       -- ROUND 4 before the double casts (scale-8 decimal->double is
       -- double-rounded in DuckDB at large magnitudes; see tpch.py Q1)
       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE 0 END), 4) AS DOUBLE)
         / CAST(ROUND(SUM(volume), 4) AS DOUBLE) AS mkt_share
FROM all_nations
GROUP BY o_year
ORDER BY o_year
"""


@declare(
    "q8_market_share",
    oracle=Q8_ORACLE,
    description="TPC-H Q8: 6-way star join + conditional-aggregate ratio (J1,J2,A9,F6)",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "customer",
        "nation", "region",
    )
    part = t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey")
    asia_nations = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    orders = t["orders"].filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    volume = _revenue()
    joined = (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                    .otherwise(F.lit(0).cast(_DEC))
                ).cast("decimal(38,4)").cast("double")
                / F.sum("volume").cast("decimal(38,4)").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution: left outer join + two-level
# aggregation (per-customer count, then histogram of counts).
# --------------------------------------------------------------------------
Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@declare(
    "q13_customer_distribution",
    oracle=Q13_ORACLE,
    description="TPC-H Q13: left outer join + double aggregation histogram (J1,A9)",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# --------------------------------------------------------------------------
# Q15 — top supplier: quarterly revenue per supplier, keep the max.
# The scalar max is joined back (broadcast of a 1-row aggregate) —
# the distributed form of the correlated subquery.
# --------------------------------------------------------------------------
Q15_ORACLE = f"""
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         CAST(ROUND(SUM({_REV_SQL}), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""


@declare(
    "q15_top_supplier",
    oracle=Q15_ORACLE,
    description="TPC-H Q15: agg view + scalar-max semi join (J1,A2,A9)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier")
    revenue0 = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).cast("decimal(38,4)").cast("double").alias("total_revenue"))
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue0.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: per-part average joined back to
# the fact (the decorrelated form of TPC-H's correlated subquery).
# --------------------------------------------------------------------------
Q17_ORACLE = """
WITH avg_qty AS (
  SELECT l_partkey AS a_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity)) AS threshold
  FROM lineitem
  GROUP BY l_partkey
)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON a_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND p_size <= 5
  AND l_quantity < threshold
"""


@declare(
    "q17_small_quantity_revenue",
    oracle=Q17_ORACLE,
    description="TPC-H Q17: decorrelated per-key average + selective fact re-join (J1,A9)",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "part")
    li = t["lineitem"]
    part = (
        t["part"]
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5))
        .select("p_partkey")
    )
    # restrict BOTH the average computation's input partkeys and the
    # fact rows to the selected parts before the shuffle: at 100 TB the
    # per-part agg over all parts would dominate, and semantics only
    # need averages for the selected parts
    selected = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    avg_qty = selected.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(_d("l_quantity")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("threshold")
    )
    return (
        selected.join(F.broadcast(avg_qty), F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.sum(_d("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------------
# Q22 (adapted) — global sales opportunity: customers richer than the
# average positive balance with no RECENT orders (since 1999 — every
# fixture customer has ordered at least once, so TPC-H's lifetime
# NOT EXISTS is vacuous here; the original Q22 likewise scopes to "in
# the last 7 years"), grouped by nation (the fixture customer table
# has no c_phone, so nation replaces the phone-prefix country code).
# Semantics otherwise intact: scalar-average subquery + anti join +
# group-aggregate.
# --------------------------------------------------------------------------
Q22_ORACLE = """
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
  FROM customer WHERE c_acctbal > 0.00
)
SELECT n_name AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
CROSS JOIN thr
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY n_name
ORDER BY n_name
"""


@declare(
    "q22_sales_opportunity",
    oracle=Q22_ORACLE,
    description="TPC-H Q22 adapted: scalar-avg threshold + anti join + nation rollup (J1 anti, A9)",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "nation")
    cust, orders, nation = t["customer"], t["orders"], t["nation"]
    # scalar threshold: 1-row aggregate broadcast, never a driver collect
    thr = cust.filter(F.col("c_acctbal") > 0.00).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    # anti join BEFORE the threshold filter would scan all orders for
    # customers the filter discards — filter first (predicate is cheap,
    # anti join shuffles), then anti join the survivors.  The date
    # predicate prunes the orders side ahead of its shuffle too.
    rich = cust.crossJoin(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    never_ordered = rich.join(
        orders.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return (
        never_ordered.join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal", scale=2),
        )
        .orderBy("cntrycode")
    )
