"""Round-32 declared queries — deterministic distinct sampling and
complete-block rank testing.

* ``q_bottomk_sample`` — the batch twin of
  ``streaming/windows.streaming_bottomk_sample``: per event type, the
  k=16 distinct users with the smallest md5 priorities.  The md5
  priority makes the sample a pure function of the distinct item set
  (order/duplicate-insensitive), so the SQL oracle replays it with a
  ROW_NUMBER over md5 — and the STREAMING sketch is exactly equal
  (pinned in tests/test_streaming_windows.py).
* ``q_friedman_test`` — Friedman's rank test over the complete-block
  design (nations present in every order year; years = blocks):
  χ²_F = 12/(m·n·(n+1))·ΣR_j² − 3·m·(n+1) from exact integer rank
  sums — the omnibus companion of Kendall's W (χ²_F = m(n−1)W).

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

QBK_ORACLE = """
WITH items AS (
  SELECT DISTINCT event_type AS etype, CAST(user_id AS VARCHAR) AS uid
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
), pri AS (
  SELECT etype, uid, md5(uid) AS priority,
         ROW_NUMBER() OVER (PARTITION BY etype ORDER BY md5(uid), uid) AS rk
  FROM items
)
SELECT etype, uid AS user_id, priority, CAST(rk AS BIGINT) AS rank
FROM pri WHERE rk <= 16
ORDER BY etype, rank
"""


@declare(
    "q_bottomk_sample",
    oracle=QBK_ORACLE,
    description="Deterministic bottom-k (KMV) distinct-user sample per event type — md5 priorities make the sample order/duplicate-insensitive, so batch SQL, the Spark plan, and the streaming applyInPandasWithState sketch all agree exactly (sampling [ext])",
)
def q_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a NULL user is not a sampleable member and a NULL type is not a
    # group (NULL md5 priorities also rank opposite ways cross-engine)
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull()
    )
    items = ev.select(
        F.col("event_type").alias("etype"),
        F.col("user_id").cast("string").alias("uid"),
    ).distinct()
    pri = items.withColumn("priority", F.md5(F.col("uid")))
    w = Window.partitionBy("etype").orderBy("priority", "uid")
    return (
        pri.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 16)
        .select(
            "etype",
            F.col("uid").alias("user_id"),
            "priority",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("etype", "rank")
    )


QFRIED_ORACLE = """
WITH rev AS (
  SELECT c.c_nationkey AS nk, year(o.o_orderdate) AS y,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS v
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), m AS (SELECT CAST(COUNT(DISTINCT y) AS BIGINT) AS m FROM rev),
complete AS (
  SELECT nk FROM rev CROSS JOIN m GROUP BY nk, m.m
  HAVING COUNT(*) = MAX(m.m)
), ranked AS (
  SELECT r.nk, r.y,
         RANK() OVER (PARTITION BY r.y ORDER BY r.v DESC, r.nk) AS rk
  FROM rev r JOIN complete c ON c.nk = r.nk
), n AS (SELECT CAST(COUNT(DISTINCT nk) AS BIGINT) AS n FROM ranked),
sums AS (
  SELECT nk, CAST(SUM(rk) AS BIGINT) AS rj FROM ranked GROUP BY nk
)
SELECT m.m AS n_years, n.n AS n_nations,
       ROUND(12.0 / (m.m * n.n * (n.n + 1))
             * CAST(SUM(CAST(rj AS HUGEINT) * rj) AS DOUBLE)
             - 3.0 * m.m * (n.n + 1), 6) AS friedman_chi2
FROM sums CROSS JOIN m CROSS JOIN n
GROUP BY m.m, n.n
"""


@declare(
    "q_friedman_test",
    oracle=QFRIED_ORACLE,
    description="Friedman rank test over the complete-block design (all-year nations × year blocks): chi-square from exact integer rank sums — the omnibus companion of Kendall's W (nonparametric repeated measures [ext])",
)
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    o, c = t["orders"], t["customer"]
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_nationkey").alias("nk"), F.year("o_orderdate").alias("y")
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("v"))
    )
    rev = rev.localCheckpoint(eager=True)  # m + completeness + ranks
    m_df = rev.agg(F.countDistinct("y").cast("long").alias("m"))
    complete = (
        rev.crossJoin(F.broadcast(m_df))
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("m").alias("m"))
        .filter(F.col("cnt") == F.col("m"))
        .select("nk")
    )
    ranked = rev.join(F.broadcast(complete), "nk").withColumn(
        "rk",
        F.rank().over(Window.partitionBy("y").orderBy(F.col("v").desc(), "nk")),
    )
    n_df = ranked.agg(F.countDistinct("nk").cast("long").alias("n"))
    sums = ranked.groupBy("nk").agg(F.sum("rk").cast("long").alias("rj"))
    stat = sums.agg(
        F.sum(F.col("rj").cast("decimal(38,0)") * F.col("rj")).alias("s2")
    )
    return (
        m_df.crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(stat))
        .select(
            F.col("m").alias("n_years"),
            F.col("n").alias("n_nations"),
            F.round(
                F.lit(12.0)
                / (F.col("m") * F.col("n") * (F.col("n") + 1))
                * F.col("s2").cast("double")
                - 3.0 * F.col("m") * (F.col("n") + 1),
                6,
            ).alias("friedman_chi2"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed minimum spanning tree (Borůvka) on the weighted nation
# trade graph.  The oracle does NOT replay Borůvka: under the
# (w, a, b) total order the MST is unique, so it applies the CYCLE
# PROPERTY — an edge belongs to the MST iff its endpoints are not
# connected using strictly lighter edges — with a bounded
# (edge × node) recursive reachability walk.  Algorithm-independent
# agreement is the strongest possible check.

QMST_ORACLE = """
WITH RECURSIVE trade AS (
  SELECT DISTINCT LEAST(c.c_nationkey, s.s_nationkey) AS a,
         GREATEST(c.c_nationkey, s.s_nationkey) AS b
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
), edges AS (
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         CAST((a + b) % 9 + 1 AS BIGINT) AS w,
         ROW_NUMBER() OVER (ORDER BY (a + b) % 9 + 1, a, b) AS id
  FROM trade
), walk AS (
  SELECT e.id, e.a AS node FROM edges e
  UNION
  SELECT wk.id, CASE WHEN f.a = wk.node THEN f.b ELSE f.a END AS node
  FROM walk wk JOIN edges f
    ON (f.a = wk.node OR f.b = wk.node) AND f.id < wk.id
)
SELECT e.a AS src, e.b AS dst, e.w
FROM edges e
WHERE NOT EXISTS (SELECT 1 FROM walk x WHERE x.id = e.id AND x.node = e.b)
ORDER BY src, dst
"""


@declare(
    "q_boruvka_mst",
    oracle=QMST_ORACLE,
    description="Distributed minimum spanning tree (Borůvka, O(log n) simultaneous component contractions) of the weighted nation trade graph; tie-broken total order makes the MST unique, and the oracle verifies it algorithm-independently via the cycle property (graph [ext])",
)
def q_boruvka_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import boruvka_mst

    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    trade = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").cast("long").alias("src"),
            F.greatest("c_nationkey", "s_nationkey").cast("long").alias("dst"),
        )
        .distinct()
        .withColumn(
            "w", ((F.col("src") + F.col("dst")) % 9 + 1).cast("long")
        )
    )
    mst = boruvka_mst(trade, "src", "dst", "w")
    return mst.orderBy("src", "dst")
