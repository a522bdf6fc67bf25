"""Round-18 declared queries — top-k view maintenance, behavioural
sequence patterns, landmark closeness centrality, and serial-
correlation diagnostics.

* ``q_incremental_topk`` — incrementally maintained per-customer
  TOP-3 orders by price under a CDC change batch
  (``operators/cdc.incremental_topk_apply``): inserts self-maintain,
  member-hit removals trigger a change-batch-bounded dirty-key
  rescan; oracle recomputes the top-3 from scratch.
* ``q_event_pattern_match`` — MATCH_RECOGNIZE-style sequence
  analysis: each user's time-ordered event-type initials become one
  string, regex patterns count funnel completions (subsequence
  view→click→purchase and the contiguous strict form).
* ``q_closeness_centrality`` — harmonic closeness of every nation on
  the trade graph via per-source level-synchronous BFS
  (``operators/graph.bfs_distances_per_source``); the oracle walks
  bounded labels with a recursive CTE and takes per-pair minima.
* ``q_durbin_watson`` — serial-correlation diagnostic of the daily
  order-count series per priority.  DW is scale-invariant, so
  residuals are computed as the INTEGER series e~_t = D·y_t − S
  (D = #days, S = Σy): numerator and denominator are exact integer
  sums, one double division at the end.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Incremental TOP-K maintenance.  Same deterministic Δ recipe as
# q_incremental_agg / q_incremental_minmax (delete %13, reprice %5
# +50.25, insert clone %9 key+1000000 +7.5); the oracle IS the
# maintained invariant — recompute the per-customer top-3 from
# scratch over the changed table.

QTOPK_ORACLE = """
WITH fact AS (
  SELECT * FROM orders
  WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
    AND o_totalprice IS NOT NULL
), surviving AS (
  SELECT * FROM fact WHERE o_orderkey % 13 <> 0
), repriced AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(o_totalprice AS DECIMAL(28,4)) + CAST(50.25 AS DECIMAL(28,4))
              ELSE CAST(o_totalprice AS DECIMAL(28,4)) END AS price
  FROM surviving
), inserted AS (
  SELECT o_orderkey + 1000000 AS o_orderkey, o_custkey,
         CAST(o_totalprice AS DECIMAL(28,4)) + CAST(7.5 AS DECIMAL(28,4)) AS price
  FROM surviving WHERE o_orderkey % 9 = 0
), t2 AS (
  SELECT * FROM repriced UNION ALL SELECT * FROM inserted
), ranked AS (
  SELECT o_custkey, o_orderkey, price,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY price DESC, o_orderkey) AS rk
  FROM t2
)
SELECT o_custkey, CAST(rk AS BIGINT) AS rank, o_orderkey,
       CAST(price AS DOUBLE) AS price
FROM ranked WHERE rk <= 3
ORDER BY o_custkey, rank
"""


@declare(
    "q_incremental_topk",
    oracle=QTOPK_ORACLE,
    description="incrementally maintained per-customer TOP-3 orders from a CDC delta — inserts self-maintain, member-hit removals rescan only dirty keys; oracle recomputes from scratch (CDC/IVM [ext])",
)
def q_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.cdc import incremental_topk_apply

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): same fence as
    # q_incremental_agg — a NULL orderkey escapes both modulo filters,
    # and NULL prices sort to opposite ends of the rank orders
    orders = orders.filter(
        F.col("o_orderkey").isNotNull()
        & F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    dec_price = F.col("o_totalprice").cast("decimal(28,4)")
    w = Window.partitionBy("o_custkey").orderBy(
        dec_price.desc(), F.col("o_orderkey").asc()
    )
    base_topk = (
        orders.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 3)
        .select("o_custkey", "o_orderkey", dec_price.alias("price"))
    )
    deletes = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.lit("d").alias("op"),
        "o_custkey",
        "o_orderkey",
        dec_price.alias("before_v"),
        F.lit(None).cast("decimal(28,4)").alias("after_v"),
    )
    surviving = orders.filter(F.col("o_orderkey") % 13 != 0)
    updates = surviving.filter(F.col("o_orderkey") % 5 == 0).select(
        F.lit("u").alias("op"),
        "o_custkey",
        "o_orderkey",
        dec_price.alias("before_v"),
        (dec_price + F.lit("50.25").cast("decimal(28,4)")).alias("after_v"),
    )
    inserts = surviving.filter(F.col("o_orderkey") % 9 == 0).select(
        F.lit("c").alias("op"),
        "o_custkey",
        (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
        F.lit(None).cast("decimal(28,4)").alias("before_v"),
        (dec_price + F.lit("7.5").cast("decimal(28,4)")).alias("after_v"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    repriced = surviving.select(
        "o_custkey",
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            dec_price + F.lit("50.25").cast("decimal(28,4)"),
        )
        .otherwise(dec_price)
        .alias("price"),
    )
    inserted = surviving.filter(F.col("o_orderkey") % 9 == 0).select(
        "o_custkey",
        (F.col("o_orderkey") + 1000000).alias("o_orderkey"),
        (dec_price + F.lit("7.5").cast("decimal(28,4)")).alias("price"),
    )
    new_fact = repriced.unionByName(inserted)
    out = incremental_topk_apply(
        base_topk,
        changes,
        new_fact,
        keys=["o_custkey"],
        id_col="o_orderkey",
        value_col="price",
        k=3,
    )
    return out.select(
        "o_custkey",
        F.col("rank").cast("long").alias("rank"),
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
    ).orderBy("o_custkey", "rank")


# ---------------------------------------------------------------------------
# Sequence pattern matching over per-user event strings — the
# MATCH_RECOGNIZE workhorse expressed as sessionized string + regex.
# The per-user string is bounded by the user's event count (the same
# grain every sessionization already shuffles on); patterns run
# map-side after ONE user-keyed agg.

QPAT_ORACLE = """
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
  FROM events GROUP BY user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN regexp_matches(s, 'v.*c.*p') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_funnel,
       CAST(SUM(CASE WHEN regexp_matches(s, 'vcp') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contiguous,
       CAST(SUM(CASE WHEN regexp_matches(s, 'e') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_error,
       ROUND(CAST(SUM(CASE WHEN regexp_matches(s, 'v.*c.*p') THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS funnel_share
FROM seq
"""


@declare(
    "q_event_pattern_match",
    oracle=QPAT_ORACLE,
    description="MATCH_RECOGNIZE-style sequence patterns: per-user time-ordered event-initial strings, regex funnel counts (subsequence and contiguous view→click→purchase) from one user-keyed agg (behavioural analytics [ext])",
)
def q_event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            F.substring("event_type", 1, 1).alias("c"),
                        )
                    )
                ),
                lambda x: x["c"],
            ),
        ).alias("s")
    )
    return seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("s").rlike("v.*c.*p").cast("int")).cast("long").alias("n_funnel"),
        F.sum(F.col("s").rlike("vcp").cast("int"))
        .cast("long")
        .alias("n_contiguous"),
        F.sum(F.col("s").rlike("e").cast("int")).cast("long").alias("n_with_error"),
        F.round(
            F.sum(F.col("s").rlike("v.*c.*p").cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("funnel_share"),
    )


# ---------------------------------------------------------------------------
# Harmonic closeness centrality of nations on the undirected trade
# graph, via per-source BFS (every nation is a landmark — the full
# exact form; at corpus scale the same operator runs over a sampled
# landmark set).  The oracle enumerates bounded hop labels with a
# recursive CTE and takes per-(source, node) minima — exact for a
# 25-node graph with diameter << 25.

QCLOSE_ORACLE = """
WITH RECURSIVE trade AS (
  SELECT DISTINCT c.c_nationkey AS a, s.s_nationkey AS b
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  WHERE c.c_nationkey <> s.s_nationkey
), edges AS (
  SELECT a AS src, b AS dst FROM trade
  UNION
  SELECT b AS src, a AS dst FROM trade
), walk AS (
  SELECT CAST(n_nationkey AS BIGINT) AS source,
         CAST(n_nationkey AS BIGINT) AS node,
         CAST(0 AS BIGINT) AS dist
  FROM nation
  UNION
  SELECT w.source, CAST(e.dst AS BIGINT) AS node, w.dist + 1 AS dist
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist + 1 <= 25
), d AS (
  SELECT source, node, MIN(dist) AS dist FROM walk GROUP BY source, node
)
SELECT source AS nationkey,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       ROUND(CAST(SUM(CASE WHEN dist > 0
                  THEN CAST(ROUND(1.0 / dist, 10) AS DECIMAL(18,12))
                  ELSE CAST(0 AS DECIMAL(18,12)) END) AS DOUBLE), 6)
         AS harmonic
FROM d
GROUP BY source
ORDER BY nationkey
"""


@declare(
    "q_closeness_centrality",
    oracle=QCLOSE_ORACLE,
    description="Harmonic closeness centrality of nations on the trade graph via per-source (landmark) level-synchronous BFS; rounded-addend decimal 1/d sums; recursive-CTE bounded-walk oracle (graph [ext])",
)
def q_closeness_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import bfs_distances_per_source

    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation")
    li, o, c, s, n = (
        t["lineitem"],
        t["orders"],
        t["customer"],
        t["supplier"],
        t["nation"],
    )
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
    sources = n.select(F.col("n_nationkey").cast("long"))
    d = bfs_distances_per_source(trade, sources, max_hops=25)
    inv = (
        F.when(
            F.col("dist") > 0, F.round(F.lit(1.0) / F.col("dist"), 10)
        )
        .otherwise(0.0)
        .cast("decimal(18,12)")
    )
    return (
        d.groupBy(F.col("source").alias("nationkey"))
        .agg(
            (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
            F.round(F.sum(inv).cast("double"), 6).alias("harmonic"),
        )
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Durbin-Watson serial-correlation statistic of the daily order-count
# series per priority.  DW is invariant to scaling the residuals, so
# e~_t = D·y_t − S (both integers) replaces y_t − S/D exactly:
# numerator Σ(e~_t − e~_{t-1})² and denominator Σe~_t² are exact
# integer sums, one double division at the end.  The lag window runs
# over the DAY-grain series (calendar-bounded), never raw rows.

QDW_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY o_orderpriority, CAST(o_orderdate AS DATE)
), tot AS (
  SELECT priority, CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(y) AS BIGINT) AS s
  FROM daily GROUP BY priority
), resid AS (
  SELECT d.priority, d.d,
         CAST(t.nd * d.y - t.s AS DECIMAL(38,0)) AS e,
         LAG(CAST(t.nd * d.y - t.s AS DECIMAL(38,0)))
           OVER (PARTITION BY d.priority ORDER BY d.d) AS e_prev
  FROM daily d JOIN tot t USING (priority)
), sums AS (
  SELECT priority,
         SUM(CASE WHEN e_prev IS NOT NULL
             THEN (e - e_prev) * (e - e_prev) ELSE 0 END) AS num,
         SUM(e * e) AS den,
         COUNT(*) AS nd
  FROM resid GROUP BY priority
)
SELECT priority, CAST(nd AS BIGINT) AS n_days,
       CASE WHEN den = 0 THEN NULL
            ELSE ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS dw
FROM sums ORDER BY priority
"""


@declare(
    "q_durbin_watson",
    oracle=QDW_ORACLE,
    description="Durbin-Watson serial-correlation diagnostic of daily order counts per priority: scale-invariance makes the residual series exactly integer (D·y−S), so both DW sums are exact; calendar-bounded lag window (time-series diagnostics [ext])",
)
def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    tot = daily.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("y").cast("long").alias("s"),
    )
    e = (F.col("nd") * F.col("y") - F.col("s")).cast("decimal(38,0)")
    w = Window.partitionBy("priority").orderBy("d")
    resid = (
        daily.join(F.broadcast(tot), "priority")
        .withColumn("e", e)
        .withColumn("e_prev", F.lag("e").over(w))
    )
    sums = resid.groupBy("priority").agg(
        F.sum(
            F.when(
                F.col("e_prev").isNotNull(),
                (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev")),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("num"),
        F.sum(F.col("e") * F.col("e")).alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_days"),
    )
    return sums.select(
        "priority",
        "n_days",
        F.when(
            F.col("den") == 0, F.lit(None).cast("double")
        )
        .otherwise(
            F.round(F.col("num").cast("double") / F.col("den").cast("double"), 6)
        )
        .alias("dw"),
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# MMR-diversified retrieval: relevance = rounded cosine to the
# vec_id=0 query; greedy k=3 selection with λ=0.7.  The oracle
# unrolls the three greedy steps explicitly (each step a 1-row
# TakeOrdered over the rescored candidates) — the same arithmetic the
# operator runs, engine-for-engine.

QMMR_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id <> 0
), rel AS (
  SELECT c.vec_id, c.v,
         ROUND(list_dot_product(c.v, q.qv)
               / (SQRT(list_dot_product(c.v, c.v))
                  * SQRT(list_dot_product(q.qv, q.qv))), 10) AS rel
  FROM c CROSS JOIN q
), s1 AS (
  SELECT vec_id, v, rel, rel AS score FROM rel ORDER BY rel DESC, vec_id LIMIT 1
), m2 AS (
  SELECT r.vec_id, r.v, r.rel,
         ROUND(0.7 * r.rel - 0.3 * ROUND(list_dot_product(r.v, s.v)
               / (SQRT(list_dot_product(r.v, r.v))
                  * SQRT(list_dot_product(s.v, s.v))), 10), 10) AS score
  FROM rel r CROSS JOIN s1 s WHERE r.vec_id <> s.vec_id
), s2 AS (
  SELECT vec_id, v, rel, score FROM m2 ORDER BY score DESC, vec_id LIMIT 1
), m3 AS (
  SELECT r.vec_id, r.rel,
         ROUND(0.7 * r.rel - 0.3 * GREATEST(
           ROUND(list_dot_product(r.v, a.v)
                 / (SQRT(list_dot_product(r.v, r.v))
                    * SQRT(list_dot_product(a.v, a.v))), 10),
           ROUND(list_dot_product(r.v, b.v)
                 / (SQRT(list_dot_product(r.v, r.v))
                    * SQRT(list_dot_product(b.v, b.v))), 10)), 10) AS score
  FROM rel r CROSS JOIN s1 a CROSS JOIN s2 b
  WHERE r.vec_id <> a.vec_id AND r.vec_id <> b.vec_id
), s3 AS (
  SELECT vec_id, rel, score FROM m3 ORDER BY score DESC, vec_id LIMIT 1
)
SELECT CAST(1 AS BIGINT) AS rank, vec_id, ROUND(rel, 6) AS relevance,
       ROUND(score, 6) AS mmr_score FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), vec_id, ROUND(rel, 6), ROUND(score, 6) FROM s3
ORDER BY rank
"""


@declare(
    "q_mmr_diversify",
    oracle=QMMR_ORACLE,
    description="MMR-diversified top-3 retrieval (λ=0.7) against the vec_id=0 query: k driver rounds, selected vectors as broadcast plan literals, 1-row TakeOrdered per round — never a candidate×candidate materialization (retrieval [ext])",
)
def q_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.similarity import cosine, mmr_select

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            F.round(cosine(F.col("embedding"), F.col("qv")), 10).alias("rel"),
        )
    )
    picked = mmr_select(
        cands, "vec_id", "embedding", "rel", k=3, lam=0.7, lam_comp=0.3
    )
    return picked.select(
        "rank",
        "vec_id",
        F.round("rel", 6).alias("relevance"),
        F.round("mmr_score", 6).alias("mmr_score"),
    ).orderBy("rank")
