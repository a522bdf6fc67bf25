"""Round-9 declared queries (built in round 7 of the engine): the geo
nearest-neighbor progressive-refinement join — the NN-only scale path
the round-6b baseline note documented but did not implement.

Determinism contract: same as round6b's geo family — coordinates are
exact integer congruential placements, the haversine is the identical
expression tree on both engines (ulp-level libm differences absorbed
by 3-decimal display rounding; argmin ties break on supplier key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Unbounded nearest supplier per customer via coarse-to-fine radius
# escalation (operators/geo.geo_nearest_join).  q_geo_radius_nearest
# pays for EVERY pair within its radius (density²·r²); this resolves
# dense regions in cheap small-radius rounds and escalates only the
# isolated points, so the large radii are probed by few rows.  The
# oracle is the brute-force cross-join argmin — exactly what the
# operator exists to avoid at scale — with the haversine written as
# the identical expression tree.
_HAV_SQL = (
    "12742.0 * ASIN(SQRT("
    "SIN(RADIANS(slat - clat) / 2) * SIN(RADIANS(slat - clat) / 2)"
    " + COS(RADIANS(clat)) * COS(RADIANS(slat))"
    " * SIN(RADIANS(slon - clon) / 2) * SIN(RADIANS(slon - clon) / 2)))"
)

QGEO_NN_ORACLE = f"""
WITH c AS (
  SELECT c_custkey,
         ((c_custkey * 37 % 12000) / 100.0) - 60.0 AS clat,
         ((c_custkey * 91 % 36000) / 100.0) - 180.0 AS clon
  FROM customer
), s AS (
  SELECT s_suppkey,
         ((s_suppkey * 67 % 12000) / 100.0) - 60.0 AS slat,
         ((s_suppkey * 149 % 36000) / 100.0) - 180.0 AS slon
  FROM supplier
), pairs AS (
  SELECT c.c_custkey, s.s_suppkey, {_HAV_SQL} AS d
  FROM c CROSS JOIN s
), ranked AS (
  SELECT c_custkey, s_suppkey, d,
         ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY d, s_suppkey) AS rn
  FROM pairs
)
SELECT c_custkey, s_suppkey AS nearest_suppkey, ROUND(d, 3) AS dist_km
FROM ranked WHERE rn = 1
ORDER BY c_custkey
"""


@declare(
    "q_geo_nearest_only",
    oracle=QGEO_NN_ORACLE,
    description="unbounded nearest supplier per customer via progressive radius refinement — dense points resolve at small radii, only isolated points probe large ones (geo NN [ext])",
)
def q_geo_nearest_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.geo import geo_nearest_join

    t = load_tables(spark, sf_dir, "customer", "supplier")
    cust = t["customer"].select(
        "c_custkey",
        (((F.col("c_custkey") * 37 % 12000) / F.lit(100.0)) - F.lit(60.0)).alias(
            "clat"
        ),
        (((F.col("c_custkey") * 91 % 36000) / F.lit(100.0)) - F.lit(180.0)).alias(
            "clon"
        ),
    )
    supp = t["supplier"].select(
        "s_suppkey",
        (((F.col("s_suppkey") * 67 % 12000) / F.lit(100.0)) - F.lit(60.0)).alias(
            "slat"
        ),
        (((F.col("s_suppkey") * 149 % 36000) / F.lit(100.0)) - F.lit(180.0)).alias(
            "slon"
        ),
    )
    nn = geo_nearest_join(
        cust,
        supp,
        left_id="c_custkey",
        right_id="s_suppkey",
        left_coords=("clat", "clon"),
        right_coords=("slat", "slon"),
        start_radius_km=250.0,
        max_radius_km=20040.0,
    )
    return nn.select(
        "c_custkey",
        F.col("s_suppkey").alias("nearest_suppkey"),
        F.round("dist_km", 3).alias("dist_km"),
    ).orderBy("c_custkey")
