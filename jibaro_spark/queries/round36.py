"""Round-36 declared queries — sketch maintenance under CDC.

* ``q_incremental_histogram`` — incrementally maintained fixed-bin
  histogram of order totals under the standard CDC delta recipe
  (delete %13, reprice %5 +50.25, insert clone %9 +7.5): histogram
  counts are FULLY self-maintainable (deletes subtract at the
  before-bin, inserts add at the after-bin, updates do both), so the
  refresh touches |Δ|-many bin deltas and never rescans the fact —
  the sketch-family counterpart of q_incremental_agg, closing the
  maintenance matrix (agg / minmax / join / distinct / top-k /
  histogram).  The oracle recomputes the histogram from scratch over
  the changed table — the maintained invariant itself.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QIH_ORACLE = """
WITH fact AS (
  SELECT * FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
), surviving AS (
  SELECT * FROM fact WHERE o_orderkey % 13 <> 0
), t2 AS (
  SELECT CASE WHEN o_orderkey % 5 = 0
              THEN CAST(o_totalprice AS DECIMAL(28,4)) + CAST(50.25 AS DECIMAL(28,4))
              ELSE CAST(o_totalprice AS DECIMAL(28,4)) END AS price
  FROM surviving
  UNION ALL
  SELECT CAST(o_totalprice AS DECIMAL(28,4)) + CAST(7.5 AS DECIMAL(28,4))
  FROM surviving WHERE o_orderkey % 9 = 0
)
SELECT CAST(floor(CAST(price AS DOUBLE) / 20000.0) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM t2 GROUP BY 1 ORDER BY bin
"""


@declare(
    "q_incremental_histogram",
    oracle=QIH_ORACLE,
    description="incrementally maintained fixed-bin histogram from a CDC delta — counts are fully self-maintainable (subtract before-bin, add after-bin), |Δ|-bounded refresh, oracle recomputes from scratch; closes the IVM matrix's sketch wing (CDC/IVM [ext])",
)
def q_incremental_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): same fence as
    # q_incremental_agg — a NULL orderkey escapes both modulo filters,
    # and a NULL price has no bin
    orders = orders.filter(
        F.col("o_orderkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    dec_price = F.col("o_totalprice").cast("decimal(28,4)")

    def to_bin(price_col):
        return F.floor(price_col.cast("double") / 20000.0).cast("long")

    # the STORED sketch: histogram of the pre-change table
    base = orders.groupBy(to_bin(dec_price).alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # the CDC delta re-expressed as per-bin count deltas: deletes and
    # update-before-images subtract, inserts and update-after-images add
    deletes = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        to_bin(dec_price).alias("bin"), F.lit(-1).alias("dn")
    )
    surviving = orders.filter(F.col("o_orderkey") % 13 != 0)
    upd = surviving.filter(F.col("o_orderkey") % 5 == 0)
    upd_before = upd.select(to_bin(dec_price).alias("bin"), F.lit(-1).alias("dn"))
    upd_after = upd.select(
        to_bin(dec_price + F.lit("50.25").cast("decimal(28,4)")).alias("bin"),
        F.lit(1).alias("dn"),
    )
    inserts = surviving.filter(F.col("o_orderkey") % 9 == 0).select(
        to_bin(dec_price + F.lit("7.5").cast("decimal(28,4)")).alias("bin"),
        F.lit(1).alias("dn"),
    )
    delta = (
        deletes.unionByName(upd_before)
        .unionByName(upd_after)
        .unionByName(inserts)
        .groupBy("bin")
        .agg(F.sum("dn").cast("long").alias("dn"))
    )
    # apply: one |bins|-bounded outer join — the fact is never rescanned
    merged = base.join(delta, "bin", "full_outer").select(
        "bin",
        (
            F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))
        ).alias("n"),
    )
    return (
        merged.filter(F.col("n") > 0)
        .select("bin", F.col("n").cast("long").alias("n"))
        .orderBy("bin")
    )
