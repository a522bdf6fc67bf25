"""Third tranche of TPC-H-derived declared queries — the partsupp /
comment / shipmode family (Q2, Q9, Q11, Q12, Q16, Q20, Q21), adapted
to the driver fixtures (TESTDATA.md has no ``partsupp`` table and no
commit/receipt dates or comment columns).

The adaptation rule: keep each original's PLAN SHAPE — that is what
exercises the engine — and substitute fixture-expressible semantics:

* ``partsupp`` → the distinct ``(l_partkey, l_suppkey)`` pairs observed
  in ``lineitem`` (a real supply relation, derived not invented).
* ``ps_supplycost`` comparisons → ``s_acctbal`` / retail-price proxies.
* receipt-vs-commit lateness → ship-vs-order-date lateness.

Shapes preserved (and their Spark-first physical strategy):

* Q2  — correlated scalar MAX subquery per part → window max over the
  candidate set (no per-row re-scan).
* Q9  — 5-way fact join + profit expression → broadcast dims, one
  shuffle on the fact keys.
* Q11 — group-sum vs scalar-threshold subquery → broadcast 1-row total.
* Q12 — CASE-bucketed counts after a fact-fact join.
* Q16 — NOT IN subquery → broadcast anti-join; count-distinct agg.
* Q20 — nested IN over a HAVING-filtered aggregate → semi-join chain.
* Q21 — double correlated EXISTS/NOT EXISTS self-join → two-level
  aggregate + per-order window (the oracle keeps the EXISTS form, so
  DuckDB independently verifies the rewrite's equivalence — no
  nested-loop anti-join survives in the Spark plan).

Determinism follows registry.py: decimal accumulation for money sums,
per-row double math rounded before decimal casts, unique-key
tie-breakers ahead of every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

_DEC = "decimal(18,4)"

_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"

_SP_SQL = "SELECT DISTINCT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey FROM lineitem"


def _supply_pairs(li: DataFrame) -> DataFrame:
    """The fixture's ``partsupp`` stand-in: observed supply pairs."""
    return li.select(
        F.col("l_partkey").alias("sp_partkey"),
        F.col("l_suppkey").alias("sp_suppkey"),
    ).distinct()


# --------------------------------------------------------------------------
# Q2-shaped — best available supplier per part in a region (correlated
# scalar MAX subquery).  Spark: the candidate set is built once, the
# per-part max comes from a window — one shuffle on p_partkey instead
# of a correlated re-scan per row.
# --------------------------------------------------------------------------
Q2_ORACLE = f"""
WITH sp AS ({_SP_SQL}),
cand AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name
  FROM part
  JOIN sp ON p_partkey = sp_partkey
  JOIN supplier ON sp_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'PROMO' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM cand c
WHERE s_acctbal = (SELECT MAX(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@declare(
    "q2_best_supplier",
    oracle=Q2_ORACLE,
    description="TPC-H Q2-shaped: correlated scalar-max subquery per part over region-filtered supply pairs (adapted: acctbal for supplycost)",
)
def q2_best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "part", "supplier", "nation", "region", "lineitem")
    cand = (
        t["part"]
        .filter(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "PROMO")
        )
        .join(
            _supply_pairs(t["lineitem"]),
            F.col("p_partkey") == F.col("sp_partkey"),
        )
        .join(
            F.broadcast(t["supplier"]),
            F.col("sp_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("__mx", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__mx"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9-shaped — product-type profit by supplier nation and year.  Profit
# uses p_retailprice×quantity as the cost proxy for ps_supplycost;
# per-row double math is rounded then decimal-accumulated so both
# engines sum identical operands exactly.
# --------------------------------------------------------------------------
Q9_ORACLE = """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(
            CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE))
            - 0.1 * CAST(p_retailprice AS DOUBLE) * CAST(l_quantity AS DOUBLE), 6)
         AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
FROM part
JOIN lineitem ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year DESC
"""


@declare(
    "q9_product_profit",
    oracle=Q9_ORACLE,
    description="TPC-H Q9-shaped: 5-way join profit rollup by supplier nation × year (adapted: retail-price cost proxy)",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "part", "supplier", "nation", "orders", "lineitem")
    amount = F.round(
        F.col("l_extendedprice").cast("double")
        * (F.lit(1) - F.col("l_discount").cast("double"))
        - F.lit(0.1)
        * F.col("p_retailprice").cast("double")
        * F.col("l_quantity").cast("double"),
        6,
    ).cast("decimal(18,6)")
    return (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("%gear%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# --------------------------------------------------------------------------
# Q11-shaped — parts carrying an outsized share of one nation's shipped
# value (group-sum vs scalar-threshold subquery).  The total is a
# 1-row broadcast; the threshold comparison stays in exact decimals so
# the row set is identical cross-engine.
# --------------------------------------------------------------------------
Q11_ORACLE = """
WITH v AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT partkey, CAST(val AS DOUBLE) AS part_value
FROM v
WHERE val > CAST(0.001 AS DECIMAL(10,6)) * (SELECT SUM(val) FROM v)
ORDER BY part_value DESC, partkey
"""


@declare(
    "q11_important_parts",
    oracle=Q11_ORACLE,
    description="TPC-H Q11-shaped: per-part value share vs scalar-subquery threshold (adapted: shipped value for stock value)",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "nation", "lineitem")
    v = (
        t["lineitem"]
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(_DEC)).alias("val"))
    )
    tot = v.agg(F.sum("val").alias("tot"))
    return (
        v.crossJoin(F.broadcast(tot))
        .filter(F.col("val") > F.lit(0.001).cast("decimal(10,6)") * F.col("tot"))
        .select("partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "partkey")
    )


# --------------------------------------------------------------------------
# Q12-shaped — late-shipment priority mix (CASE-bucketed counts after
# the orders⋈lineitem join).  Lateness = shipped >60 days after the
# order date (fixture stand-in for receipt-vs-commit).
# --------------------------------------------------------------------------
Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@declare(
    "q12_late_priority",
    oracle=Q12_ORACLE,
    description="TPC-H Q12-shaped: late-shipment high/low priority counts per return flag (adapted: ship-vs-order lateness)",
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Q16-shaped — supplier diversity per part class, excluding flagged
# suppliers via NOT IN (broadcast anti-join; s_suppkey is non-null so
# NOT IN ≡ anti-join).
# --------------------------------------------------------------------------
Q16_ORACLE = f"""
WITH sp AS ({_SP_SQL})
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT sp_suppkey) AS BIGINT) AS supplier_cnt
FROM sp
JOIN part ON sp_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND sp_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@declare(
    "q16_supplier_diversity",
    oracle=Q16_ORACLE,
    description="TPC-H Q16-shaped: distinct-supplier counts per part class with NOT-IN supplier exclusion (adapted: negative balance for complaints)",
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem")
    flagged = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        _supply_pairs(t["lineitem"])
        .join(
            F.broadcast(flagged),
            F.col("sp_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(parts), F.col("sp_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.count_distinct("sp_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q20-shaped — suppliers who moved heavy volume of a part family
# (nested IN over a HAVING-filtered aggregate → semi-join onto the
# supplier dim).
# --------------------------------------------------------------------------
Q20_ORACLE = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_acctbal >= 0
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'small%'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 80
  )
ORDER BY s_name
"""


@declare(
    "q20_heavy_movers",
    oracle=Q20_ORACLE,
    description="TPC-H Q20-shaped: nested-IN over HAVING-filtered per-(supplier,part) volume (adapted: shipped qty for availqty)",
)
def q20_heavy_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "part", "supplier", "lineitem")
    heavy = (
        t["lineitem"]
        .join(
            F.broadcast(t["part"].filter(F.col("p_name").like("small%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("__q"))
        .filter(F.col("__q") > 80)
        .select("l_suppkey")
    )
    return (
        t["supplier"]
        .filter(F.col("s_acctbal") >= 0)
        .join(
            F.broadcast(heavy),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21-shaped — suppliers whose shipment closed out multi-supplier
# orders (the straggler).  The oracle keeps the original's correlated
# EXISTS / NOT-EXISTS form; the Spark plan is the scale rewrite:
# per-(order,supplier) max-ship aggregate, then a per-order window for
# the order max and supplier count — two shuffles, NO nested-loop
# anti-join (a non-equi NOT EXISTS would be a BroadcastNestedLoopJoin
# over lineitem² at 100 TB).
# --------------------------------------------------------------------------
Q21_ORACLE = """
WITH w AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  WHERE EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate)
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM w
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@declare(
    "q21_straggler_suppliers",
    oracle=Q21_ORACLE,
    description="TPC-H Q21-shaped: double correlated EXISTS rewritten as aggregate+window (oracle keeps EXISTS form — independent equivalence check)",
)
def q21_straggler_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "supplier", "orders", "lineitem")
    g = (
        t["lineitem"]
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("__ms"))
    )
    w = Window.partitionBy("l_orderkey")
    stragglers = (
        g.withColumn("__omax", F.max("__ms").over(w))
        .withColumn("__nsupp", F.count(F.lit(1)).over(w))
        .filter((F.col("__ms") == F.col("__omax")) & (F.col("__nsupp") >= 2))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        stragglers.join(
            t["orders"].filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
