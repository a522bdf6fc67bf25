"""Round-25 declared queries — spatial density clustering, spatial
randomness testing, and second-order Benford screening.

* ``q_grid_dbscan`` — grid-based density clustering (the scalable
  DBSCAN surrogate: CLIQUE/GriDBSCAN family): 2°-cell counts, cells
  denser than the mean are "core", core cells merge through 8-neighbor
  adjacency (the 3×3 shifted equi-join — never a distance cross
  join), connected components label the clusters.  The oracle replays
  everything including the transitive closure (recursive CTE).
* ``q_quadrat_csr`` — quadrat-count test of complete spatial
  randomness: chi-square of per-cell counts against the uniform
  expectation over OCCUPIED-domain cells, plus the variance-mean
  ratio (index of dispersion).
* ``q_benford_second_digit`` — the second-digit Benford screen
  (Σ_d log10(1 + 1/(10d+k)) expectation) — the forensic follow-up to
  q_benford_digits' first-digit test; exact integer digit extraction.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# Deterministic synthetic coordinates (round-6b convention):
# lat ∈ [-60, 60), lon ∈ [-180, 180) from the customer key.
_PTS_SQL = """
  SELECT c_custkey,
         ((c_custkey * 37 % 12000) / 100.0) - 60.0 AS lat,
         ((c_custkey * 91 % 36000) / 100.0) - 180.0 AS lon
  FROM customer
"""

QDBSCAN_ORACLE = f"""
WITH RECURSIVE pts AS ({_PTS_SQL}),
cells AS (
  SELECT CAST(FLOOR(lat / 2.0) AS BIGINT) AS cx,
         CAST(FLOOR(lon / 2.0) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
), thresh AS (
  SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mean_n FROM cells
), core AS (
  SELECT cx, cy, n, (cx + 60) * 1000 + (cy + 180) AS cid
  FROM cells CROSS JOIN thresh WHERE n > mean_n
), edges AS (
  SELECT a.cid AS src, b.cid AS dst
  FROM core a JOIN core b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1 AND a.cid <> b.cid
), comp AS (
  SELECT cid AS node, cid AS root FROM core
  UNION
  SELECT e.dst AS node, c.root FROM comp c JOIN edges e ON e.src = c.node
), labels AS (
  SELECT node, MIN(root) AS cluster_id FROM comp GROUP BY node
)
SELECT l.cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(k.n) AS BIGINT) AS n_points
FROM labels l JOIN core k ON k.cid = l.node
GROUP BY l.cluster_id
HAVING COUNT(*) >= 2
ORDER BY l.cluster_id
"""


@declare(
    "q_grid_dbscan",
    oracle=QDBSCAN_ORACLE,
    description="Grid-based density clustering (scalable DBSCAN surrogate): above-mean-density 2° cells merged through 8-neighbor adjacency equi-joins + connected components; oracle replays incl. recursive-CTE closure (spatial clustering [ext])",
)
def q_grid_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import connected_components

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    pts = cust.select(
        (((F.col("c_custkey") * 37) % 12000) / 100.0 - 60.0).alias("lat"),
        (((F.col("c_custkey") * 91) % 36000) / 100.0 - 180.0).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 2.0).cast("long").alias("cx"),
        F.floor(F.col("lon") / 2.0).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = cells.localCheckpoint(eager=True)  # threshold + core share it
    thresh = cells.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_n")
    )
    core = (
        cells.crossJoin(F.broadcast(thresh))
        .filter(F.col("n") > F.col("mean_n"))
        .select(
            "cx",
            "cy",
            "n",
            ((F.col("cx") + 60) * 1000 + (F.col("cy") + 180)).alias("cid"),
        )
    )
    core = core.localCheckpoint(eager=True)  # edges (both sides) + rollup
    b = core.select(
        F.col("cx").alias("bx"), F.col("cy").alias("by"), F.col("cid").alias("bcid")
    )
    edges = (
        core.join(
            b,
            (F.abs(F.col("cx") - F.col("bx")) <= 1)
            & (F.abs(F.col("cy") - F.col("by")) <= 1)
            & (F.col("cid") != F.col("bcid")),
        )
        .select(F.col("cid").alias("src"), F.col("bcid").alias("dst"))
    )
    comp = connected_components(edges)
    labeled = core.join(comp, core["cid"] == comp["node"], "left").select(
        "cid", "n", F.coalesce(F.col("component"), F.col("cid")).alias("cluster_id")
    )
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_points"),
        )
        .filter(F.col("n_cells") >= 2)
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Quadrat test of complete spatial randomness over the SAME cells.

QQUAD_ORACLE = f"""
WITH pts AS ({_PTS_SQL}),
cells AS (
  SELECT CAST(FLOOR(lat / 2.0) AS BIGINT) AS cx,
         CAST(FLOOR(lon / 2.0) AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM pts GROUP BY 1, 2
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS q, CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS BIGINT) AS ss
  FROM cells
)
SELECT q AS n_quadrats, nn AS n_points,
       ROUND(CAST(nn AS DOUBLE) / q, 6) AS mean_count,
       ROUND(((CAST(ss AS DOUBLE) - CAST(nn AS DOUBLE) * nn / q) / (q - 1))
             / (CAST(nn AS DOUBLE) / q), 6) AS dispersion_index,
       ROUND((CAST(ss AS DOUBLE) - CAST(nn AS DOUBLE) * nn / q)
             / (CAST(nn AS DOUBLE) / q), 6) AS chi2
FROM tot
"""


@declare(
    "q_quadrat_csr",
    oracle=QQUAD_ORACLE,
    description="Quadrat-count test of complete spatial randomness: index of dispersion (sample variance / mean) and chi-square over occupied 2° cells, exact integer moments (spatial stats [ext])",
)
def q_quadrat_csr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    pts = cust.select(
        (((F.col("c_custkey") * 37) % 12000) / 100.0 - 60.0).alias("lat"),
        (((F.col("c_custkey") * 91) % 36000) / 100.0 - 180.0).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 2.0).cast("long").alias("cx"),
        F.floor(F.col("lon") / 2.0).cast("long").alias("cy"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cells.agg(
        F.count(F.lit(1)).cast("long").alias("q"),
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    mean = F.col("nn").cast("double") / F.col("q")
    ssdev = F.col("ss").cast("double") - F.col("nn").cast("double") * F.col("nn") / F.col("q")
    return tot.select(
        F.col("q").alias("n_quadrats"),
        F.col("nn").alias("n_points"),
        F.round(mean, 6).alias("mean_count"),
        F.round((ssdev / (F.col("q") - 1)) / mean, 6).alias("dispersion_index"),
        F.round(ssdev / mean, 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Second-digit Benford screen: P(second = k) = Σ_{d=1..9}
# log10(1 + 1/(10d + k)).  Exact integer digit extraction, two-digit
# values and up only.

QB2_ORACLE = """
WITH v AS (
  SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS iv FROM orders
  WHERE o_totalprice >= 10
), d AS (
  SELECT CAST(FLOOR(iv / POWER(10, LENGTH(CAST(iv AS VARCHAR)) - 2)) AS BIGINT)
           % 10 AS digit
  FROM v
), c AS (
  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1
), t AS (SELECT SUM(n) AS tot FROM c),
exp_p AS (
  SELECT k AS digit,
         ROUND(LOG10(1.0 + 1.0 / (10 + k)) + LOG10(1.0 + 1.0 / (20 + k))
             + LOG10(1.0 + 1.0 / (30 + k)) + LOG10(1.0 + 1.0 / (40 + k))
             + LOG10(1.0 + 1.0 / (50 + k)) + LOG10(1.0 + 1.0 / (60 + k))
             + LOG10(1.0 + 1.0 / (70 + k)) + LOG10(1.0 + 1.0 / (80 + k))
             + LOG10(1.0 + 1.0 / (90 + k)), 6) AS benford_p
  FROM (SELECT unnest(generate_series(0, 9)) AS k)
)
SELECT e.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.tot, 6) AS observed_p,
       e.benford_p
FROM exp_p e LEFT JOIN c ON c.digit = e.digit CROSS JOIN t
ORDER BY e.digit
"""


@declare(
    "q_benford_second_digit",
    oracle=QB2_ORACLE,
    description="Second-digit Benford screen of order totals vs Σ_d log10(1+1/(10d+k)) — the forensic follow-up to the first-digit test, exact integer digit extraction (stats [ext])",
)
def q_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    iv = F.floor(F.col("o_totalprice")).cast("long")
    d = orders.filter(F.col("o_totalprice") >= 10).select(
        (
            F.floor(
                iv / F.pow(F.lit(10.0), F.length(iv.cast("string")) - 2)
            ).cast("long")
            % 10
        ).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    exp_rows = spark.range(0, 10).select(F.col("id").cast("long").alias("digit"))
    benford_p = F.round(
        sum(
            F.log10(F.lit(1.0) + F.lit(1.0) / (10 * d10 + F.col("digit")))
            for d10 in range(1, 10)
        ),
        6,
    )
    return (
        exp_rows.join(c, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
            F.round(
                F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("tot"), 6
            ).alias("observed_p"),
            benford_p.alias("benford_p"),
        )
        .orderBy("digit")
    )
