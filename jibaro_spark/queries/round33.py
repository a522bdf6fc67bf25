"""Round-33 declared queries — exact graph distance summaries and
percolation robustness.

* ``q_graph_diameter`` — per-node eccentricity plus graph
  diameter/radius/effective (p90) diameter of the nation trade graph
  via per-source level-synchronous BFS
  (``operators/graph.bfs_distances_per_source`` — the landmark
  machinery, run exhaustively on the nation-bounded node set).
* ``q_percolation_thresholds`` — bond-percolation sweep: keep only
  edges with weight ≤ τ for τ ∈ {3, 6, 9}, run connected components
  at each threshold, report component counts and the giant-component
  share — the network-robustness curve.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

_TRADE_SQL = """
  SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
"""

QDIAM_ORACLE = f"""
WITH RECURSIVE trade AS ({_TRADE_SQL}),
edges AS (
  SELECT a AS src, b AS dst FROM trade
  UNION
  SELECT b AS src, a AS dst FROM trade
), nodes AS (
  SELECT DISTINCT CAST(src AS BIGINT) AS n FROM edges
), walk AS (
  SELECT n AS source, n AS node, CAST(0 AS BIGINT) AS dist FROM nodes
  UNION
  SELECT w.source, CAST(e.dst AS BIGINT), w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist + 1 <= 25
), d AS (
  SELECT source, node, MIN(dist) AS dist FROM walk GROUP BY source, node
), ecc AS (
  SELECT source, CAST(MAX(dist) AS BIGINT) AS eccentricity FROM d
  GROUP BY source
), gstats AS (
  SELECT CAST(MAX(eccentricity) AS BIGINT) AS diameter,
         CAST(MIN(eccentricity) AS BIGINT) AS radius
  FROM ecc
), eff AS (
  SELECT CAST(MIN(CASE WHEN cum >= CAST(ceil(0.9 * n) AS BIGINT) THEN dist END)
         AS BIGINT) AS effective_diameter
  FROM (
    SELECT dist, SUM(c) OVER (ORDER BY dist) AS cum, SUM(c) OVER () AS n
    FROM (SELECT dist, COUNT(*) AS c FROM d WHERE dist > 0 GROUP BY dist)
  )
)
SELECT e.source AS nationkey, e.eccentricity,
       g.diameter, g.radius, f.effective_diameter
FROM ecc e CROSS JOIN gstats g CROSS JOIN eff f
ORDER BY nationkey
"""


@declare(
    "q_graph_diameter",
    oracle=QDIAM_ORACLE,
    description="Exact eccentricities, diameter, radius, and effective (p90) diameter of the nation trade graph via exhaustive per-source BFS on the nation-bounded node set (graph distance summaries [ext])",
)
def q_graph_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import bfs_distances_per_source

    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    trade = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .distinct()
    )
    trade = trade.localCheckpoint(eager=True)
    nodes = (
        trade.select(F.col("src").alias("n"))
        .union(trade.select(F.col("dst").alias("n")))
        .distinct()
    )
    d = bfs_distances_per_source(trade, nodes, max_hops=25)
    d = d.localCheckpoint(eager=True)  # ecc + distance ECDF share it
    ecc = d.groupBy(F.col("source").alias("nationkey")).agg(
        F.max("dist").cast("long").alias("eccentricity")
    )
    glob = ecc.agg(
        F.max("eccentricity").cast("long").alias("diameter"),
        F.min("eccentricity").cast("long").alias("radius"),
    )
    from pyspark.sql.window import Window

    cells = (
        d.filter(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = cells.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(Window.partitionBy())
    )
    eff = ecdf.agg(
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(0.9) * F.col("n")).cast("long"),
                F.col("dist"),
            )
        )
        .cast("long")
        .alias("effective_diameter")
    )
    return (
        ecc.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(eff))
        .orderBy("nationkey")
    )


QPERC_ORACLE = (
    """
WITH RECURSIVE trade AS ("""
    + _TRADE_SQL
    + """),
wedges AS (
  SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b,
         (LEAST(a, b) + GREATEST(a, b)) % 9 + 1 AS w
  FROM trade
  GROUP BY 1, 2, 3
), nodes AS (
  SELECT DISTINCT CAST(a AS BIGINT) AS n FROM wedges
  UNION
  SELECT DISTINCT CAST(b AS BIGINT) FROM wedges
), taus AS (SELECT unnest([3, 6, 9]) AS tau),
live AS (
  SELECT t.tau, CAST(e.a AS BIGINT) AS src, CAST(e.b AS BIGINT) AS dst
  FROM wedges e JOIN taus t ON e.w <= t.tau
  UNION ALL
  SELECT t.tau, CAST(e.b AS BIGINT), CAST(e.a AS BIGINT)
  FROM wedges e JOIN taus t ON e.w <= t.tau
), comp AS (
  SELECT t.tau, n.n AS node, n.n AS root FROM nodes n CROSS JOIN taus t
  UNION
  SELECT c.tau, l.dst AS node, c.root
  FROM comp c JOIN live l ON l.tau = c.tau AND l.src = c.node
), labels AS (
  SELECT tau, node, MIN(root) AS cluster FROM comp GROUP BY tau, node
), sizes AS (
  SELECT tau, cluster, CAST(COUNT(*) AS BIGINT) AS sz
  FROM labels GROUP BY tau, cluster
)
SELECT CAST(tau AS BIGINT) AS tau,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(MAX(sz) AS BIGINT) AS giant_size,
       ROUND(CAST(MAX(sz) AS DOUBLE) / SUM(sz), 6) AS giant_share
FROM sizes GROUP BY tau ORDER BY tau
"""
)


@declare(
    "q_percolation_thresholds",
    oracle=QPERC_ORACLE,
    description="Bond-percolation sweep of the weighted trade graph (edges with w ≤ τ for τ ∈ {3,6,9}): connected components per threshold, component counts and giant-component share — the network-robustness curve (graph [ext])",
)
def q_percolation_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import connected_components

    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    wedges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").cast("long").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").cast("long").alias("b"),
        )
        .distinct()
        .withColumn("w", (F.col("a") + F.col("b")) % 9 + 1)
    )
    wedges = wedges.localCheckpoint(eager=True)  # one CC pass per tau
    nodes = (
        wedges.select(F.col("a").alias("node"))
        .union(wedges.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = None
    for tau in (3, 6, 9):
        live = wedges.filter(F.col("w") <= tau).select("a", "b")
        comp = connected_components(live, src="a", dst="b")
        labels = nodes.join(comp, "node", "left").select(
            "node", F.coalesce(F.col("component"), F.col("node")).alias("cluster")
        )
        sizes = labels.groupBy("cluster").agg(
            F.count(F.lit(1)).cast("long").alias("sz")
        )
        branch = sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.max("sz").cast("long").alias("giant_size"),
            F.round(F.max("sz").cast("double") / F.sum("sz"), 6).alias(
                "giant_share"
            ),
        ).select(F.lit(tau).cast("long").alias("tau"), "*")
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("tau")
