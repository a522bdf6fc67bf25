"""Round-20 declared queries — intermittent-demand forecasting.

* ``q_croston_demand`` — Croston's method over a deliberately
  THINNED demand series (orders with ``o_orderkey % 50 = 0``) on a
  dense zero-filled 400-day calendar window per priority
  (``operators/sequential.croston``).  The zero-fill matters: the
  method's whole point is separating demand SIZE from demand
  INTERVAL, which requires the zero periods to exist as rows.  α=1/2
  keeps every smoothing step an exact IEEE expression, so the
  recursive-CTE oracle replay is bit-identical (the q_holt_forecast /
  q_holt_winters discipline).

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QCROSTON_ORACLE = """
WITH RECURSIVE od AS (
  SELECT * FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_orderdate IS NOT NULL
    AND o_orderkey IS NOT NULL
), bounds AS (
  SELECT date_diff('day', DATE '1970-01-01', MIN(CAST(o_orderdate AS DATE))) AS d0,
         LEAST(date_diff('day', DATE '1970-01-01', MAX(CAST(o_orderdate AS DATE))),
               date_diff('day', DATE '1970-01-01', MIN(CAST(o_orderdate AS DATE))) + 399)
           AS d1
  FROM od
), pr AS (
  SELECT DISTINCT o_orderpriority AS priority FROM od
), cal AS (
  SELECT pr.priority, CAST(b.d0 + g.i AS BIGINT) AS dn
  FROM pr CROSS JOIN bounds b
  CROSS JOIN (SELECT unnest(generate_series(0,
              (SELECT d1 - d0 FROM bounds))) AS i) g
), dem AS (
  SELECT o_orderpriority AS priority,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dn,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM od CROSS JOIN bounds b
  WHERE o_orderkey % 50 = 0
    AND date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) <= b.d1
  GROUP BY 1, 2
), seq AS (
  SELECT c.priority, c.dn, COALESCE(d.x, 0.0) AS x,
         ROW_NUMBER() OVER (PARTITION BY c.priority ORDER BY c.dn) AS rn
  FROM cal c LEFT JOIN dem d USING (priority, dn)
), rec AS (
  SELECT priority, dn, rn, x,
         CASE WHEN x > 0 THEN x END AS z,
         CASE WHEN x > 0 THEN CAST(1.0 AS DOUBLE) END AS p,
         CASE WHEN x > 0 THEN 1 ELSE 2 END AS q
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.priority, s.dn, s.rn, s.x,
         CASE WHEN s.x > 0 AND r.z IS NULL THEN s.x
              WHEN s.x > 0 THEN 0.5 * s.x + 0.5 * r.z
              ELSE r.z END,
         CASE WHEN s.x > 0 AND r.z IS NULL THEN CAST(r.q AS DOUBLE)
              WHEN s.x > 0 THEN 0.5 * CAST(r.q AS DOUBLE) + 0.5 * r.p
              ELSE r.p END,
         CASE WHEN s.x > 0 THEN 1 ELSE r.q + 1 END
  FROM rec r JOIN seq s ON s.priority = r.priority AND s.rn = r.rn + 1
)
SELECT priority, dn, x,
       ROUND(z, 6) AS z_hat, ROUND(p, 6) AS p_hat,
       ROUND(z / p, 6) AS forecast
FROM rec
WHERE x > 0 OR rn % 25 = 0
ORDER BY priority, dn
"""


@declare(
    "q_croston_demand",
    oracle=QCROSTON_ORACLE,
    description="Croston intermittent-demand forecasting (α=1/2) of a thinned order series on a dense zero-filled 400-day calendar window per priority — demand-size and demand-interval states, bit-identical recursive-CTE replay; output sampled to demand days + every-25th zero day (forecasting [ext])",
)
def q_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sequential import croston

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): the calendar needs a
    # defined priority/date/key — a NULL-priority lane would zero-fill
    # in the kernel but never extend the oracle's equality-joined
    # recursion past its first row
    orders = orders.filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_orderdate").isNotNull()
        & F.col("o_orderkey").isNotNull()
    )
    dn_expr = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    # 400-day study window: Croston's behaviour is fully exercised in
    # ~400 periods, and the oracle's recursion depth stays bounded
    bounds = orders.agg(
        F.min(dn_expr).alias("d0"),
        F.least(F.max(dn_expr), F.min(dn_expr) + 399).alias("d1"),
    )
    pr = orders.select(F.col("o_orderpriority").alias("priority")).distinct()
    cal = (
        pr.crossJoin(F.broadcast(bounds))
        .select(
            "priority",
            F.explode(F.sequence(F.lit(0), F.col("d1") - F.col("d0"))).alias("i"),
            "d0",
        )
        .select("priority", (F.col("d0") + F.col("i")).cast("long").alias("dn"))
    )
    dem = (
        orders.filter(F.col("o_orderkey") % 50 == 0)
        .crossJoin(F.broadcast(bounds))
        .filter(dn_expr <= F.col("d1"))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            dn_expr.cast("long").alias("dn"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    seq = cal.join(dem, ["priority", "dn"], "left").select(
        "priority", "dn", F.coalesce(F.col("x"), F.lit(0.0)).alias("x")
    )
    out = croston(seq, keys=["priority"], order_by=["dn"], value_col="x")
    # sample the (calendar-sized) output: every demand day + every
    # 25th zero day, so rows stay bounded while both update branches
    # stay visible to the hash check
    from pyspark.sql.window import Window

    w = Window.partitionBy("priority").orderBy("dn")
    out = out.withColumn("__rn", F.row_number().over(w))
    return (
        out.filter((F.col("x") > 0) | (F.col("__rn") % 25 == 0))
        .select(
            "priority",
            "dn",
            "x",
            F.round("z_hat", 6).alias("z_hat"),
            F.round("p_hat", 6).alias("p_hat"),
            F.round(F.col("z_hat") / F.col("p_hat"), 6).alias("forecast"),
        )
        .orderBy("priority", "dn")
    )


# ---------------------------------------------------------------------------
# End-to-end entity resolution ([ext] ER flagship, the linkage twin of
# q_minhash_dedup_clusters): degrade a replica of the customer master
# (round8's md5 recipe), block on nation, Fellegi-Sunter-score the
# candidates, keep score >= 12 as match edges, close them transitively
# (connected components), and survive ONE canonical record per cluster
# (master side preferred, then min id).  The oracle replays the WHOLE
# pipeline — degradation, blocking, scoring, a recursive-CTE
# transitive closure, and survivorship — so the driver hash-checks the
# full resolution surface, not just the pair scores.

_ER_SQL_MD5 = (
    "CAST(('0x' || substr(md5('{salt}|' || CAST(c_custkey AS VARCHAR)), 1, 8))"
    " AS BIGINT) % 10"
)

QER_ORACLE = f"""
WITH RECURSIVE cust AS (
  -- identity and block key must be defined (NULL compare fields are
  -- fine: both engines score them as non-matches); a NULL id would
  -- form a cluster the SQL equality join can never label
  SELECT * FROM customer
  WHERE c_custkey IS NOT NULL AND c_nationkey IS NOT NULL
), a AS (
  SELECT c_custkey AS id, c_name AS name,
         CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
         c_mktsegment AS seg, c_nationkey AS nat, 'a' AS side
  FROM cust
), b AS (
  SELECT c_custkey + 1000000 AS id,
         CASE WHEN {_ER_SQL_MD5.format(salt='n')} = 0
              THEN reverse(c_name) ELSE c_name END AS name,
         CASE WHEN {_ER_SQL_MD5.format(salt='b')} = 0
              THEN CAST(c_acctbal AS DECIMAL(18,2)) + 100.00
              ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS bal,
         CASE WHEN {_ER_SQL_MD5.format(salt='s')} = 0
              THEN 'UNKNOWN' ELSE c_mktsegment END AS seg,
         c_nationkey AS nat, 'b' AS side
  FROM cust
), records AS (
  SELECT * FROM a UNION ALL SELECT * FROM b
), scored AS (
  SELECT a.id AS src, b.id AS dst,
         CAST(CAST(CASE WHEN a.name = b.name THEN 13.135709 ELSE -3.321784 END AS DECIMAL(18,6))
            + CAST(CASE WHEN a.bal  = b.bal  THEN 9.731319  ELSE -2.735522 END AS DECIMAL(18,6))
            + CAST(CASE WHEN a.seg  = b.seg  THEN 2.0       ELSE -2.0      END AS DECIMAL(18,6))
           AS DECIMAL(28,6)) AS score
  FROM a JOIN b ON a.nat = b.nat
), edges AS (
  SELECT src, dst FROM scored WHERE score >= 12.0
  UNION
  SELECT dst, src FROM scored WHERE score >= 12.0
), comp AS (
  SELECT id AS node, id AS root FROM records
  UNION
  SELECT e.dst AS node, c.root
  FROM comp c JOIN edges e ON e.src = c.node
), labels AS (
  SELECT node, MIN(root) AS cluster_id FROM comp GROUP BY node
)
SELECT l.cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(CASE WHEN r.side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_master,
       MIN(CASE WHEN r.side = 'a' THEN r.id END) AS canonical_id
FROM labels l JOIN records r ON r.id = l.node
GROUP BY l.cluster_id
HAVING COUNT(*) >= 2
ORDER BY l.cluster_id
"""


@declare(
    "q_er_pipeline",
    oracle=QER_ORACLE,
    description="End-to-end entity resolution: degraded replica → nation-blocked Fellegi-Sunter scoring → match edges → connected-components closure → master-preferred survivorship; oracle replays the whole pipeline incl. a recursive-CTE transitive closure (ER flagship [ext])",
)
def q_er_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import connected_components
    from jibaro_spark.operators.linkage import FieldComparator, fellegi_sunter_join

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    # NULL contract (relational fuzz sweep): identity and block key
    # must be defined — a NULL id forms a cluster the oracle's equality
    # join can never label; NULL compare fields stay (both engines
    # score them as non-matches)
    cust = cust.filter(
        F.col("c_custkey").isNotNull() & F.col("c_nationkey").isNotNull()
    )

    def md5_mod(salt: str):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}|"), F.col("c_custkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        return F.pmod(h, F.lit(10))

    a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("a_name"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("a_bal"),
        F.col("c_mktsegment").alias("a_seg"),
        F.col("c_nationkey").alias("a_nat"),
    )
    b = cust.select(
        (F.col("c_custkey") + 1000000).alias("b_id"),
        F.when(md5_mod("n") == 0, F.reverse(F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.when(
            md5_mod("b") == 0,
            F.col("c_acctbal").cast("decimal(18,2)")
            + F.lit("100.00").cast("decimal(18,2)"),
        )
        .otherwise(F.col("c_acctbal").cast("decimal(18,2)"))
        .alias("b_bal"),
        F.when(md5_mod("s") == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        F.col("c_nationkey").alias("b_nat"),
    )
    scored = fellegi_sunter_join(
        a,
        b,
        "a_id",
        "b_id",
        block_on=[("a_nat", "b_nat")],
        comparators=[
            FieldComparator("name", F.col("a_name") == F.col("b_name"), 0.9, 0.0001),
            FieldComparator("bal", F.col("a_bal") == F.col("b_bal"), 0.85, 0.001),
            FieldComparator("seg", F.col("a_seg") == F.col("b_seg"), 0.8, 0.2),
        ],
        upper=12.0,
        lower=0.0,
    )
    edges = scored.filter(F.col("decision") == "match").select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    records = a.select(
        F.col("a_id").alias("id"), F.lit("a").alias("side")
    ).unionByName(b.select(F.col("b_id").alias("id"), F.lit("b").alias("side")))
    comp = connected_components(edges)
    labeled = records.join(
        comp, records["id"] == comp["node"], "left"
    ).select(
        "id",
        "side",
        F.coalesce(F.col("component"), F.col("id")).alias("cluster_id"),
    )
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum((F.col("side") == "a").cast("int")).cast("long").alias("n_master"),
            F.min(F.when(F.col("side") == "a", F.col("id"))).alias("canonical_id"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("cluster_id")
    )
