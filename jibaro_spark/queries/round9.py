"""Round-9 declared queries (built in round 7 of the engine):

- the geo nearest-neighbor progressive-refinement join — the NN-only
  scale path the round-6b baseline note documented but did not
  implement;
- retrieval evaluation (NDCG@k / MRR) over the exact cosine top-k —
  the metric layer a retrieval/RAG pipeline needs next to the kNN
  operators themselves;
- propensity-score matching (nation-blocked 1-NN with replacement on
  an exact-decimal score, ATT estimate) — the matching member of the
  causal family (DiD, CUPED already covered);
- Neyman optimal sample allocation with largest-remainder integer
  rounding — the survey-design complement of the Horvitz-Thompson
  estimator.

Determinism contract: same as the rest of the registry — exact
integer/decimal lanes for everything ranked or compared, per-term
``round(·,10) → decimal`` accumulation for log terms, doubles only as
single identical expressions or at the display boundary, explicit
tie-breaks in every ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


# ---------------------------------------------------------------------------
# Retrieval evaluation: NDCG@5 and MRR over the exact cosine top-k
# ([ext] ML-eval — the metric layer of a retrieval/RAG pipeline; the
# ranking itself is q_knn_bruteforce's proven engine-deterministic
# form: cosine rounded to 6 before ranking, ties on vec_id).  Graded
# relevance comes from the fixture labels (3 = label match, 1 = label
# congruent mod 4, 0 otherwise); each DCG term
# (2^rel − 1)/log2(rank+1) is one double expression over a finite
# (rel, rank) set, rounded to 10 decimals and DECIMAL-summed so both
# engines add identical addends in any order.  IDCG re-ranks the SAME
# retrieved 5 by (rel desc, rank) — the standard local-ideal form.
# Scale: queries broadcast against the corpus scan, per-query top-k
# window, then all metric math on #queries × k rows.
QNDCG_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec, label AS q_label
  FROM embeddings WHERE vec_id % 100 = 0
), pairs AS (
  SELECT q.q_id, q.q_label, e.vec_id, e.label,
         ROUND(list_dot_product(q.q_vec, CAST(e.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(q.q_vec, q.q_vec))
                  * SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))), 6)
           AS cosine_sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, q_label, vec_id, label, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM pairs
), top AS (
  SELECT q_id,
         CASE WHEN q_label = label THEN 3
              WHEN q_label % 4 = label % 4 THEN 1 ELSE 0 END AS rel,
         rank
  FROM ranked WHERE rank <= 5
), ideal AS (
  SELECT q_id, rel, rank,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, rank) AS irank
  FROM top
), terms AS (
  SELECT q_id, rel, rank,
         CAST(ROUND((POWER(2, rel) - 1) / (LN(rank + 1) / LN(2)), 10)
              AS DECIMAL(18,10)) AS dterm,
         CAST(ROUND((POWER(2, rel) - 1) / (LN(irank + 1) / LN(2)), 10)
              AS DECIMAL(18,10)) AS iterm
  FROM ideal
), agg AS (
  SELECT q_id,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
         CAST(SUM(dterm) AS DOUBLE) AS dcg,
         CAST(SUM(iterm) AS DOUBLE) AS idcg,
         MIN(CASE WHEN rel > 0 THEN rank END) AS first_rel
  FROM terms GROUP BY q_id
)
SELECT q_id, n_rel,
       ROUND(dcg, 6) AS dcg5,
       ROUND(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END, 6) AS ndcg5,
       ROUND(COALESCE(1.0 / first_rel, 0.0), 6) AS rr
FROM agg
ORDER BY q_id
"""


@declare(
    "q_retrieval_ndcg",
    oracle=QNDCG_ORACLE,
    description="NDCG@5 + MRR retrieval evaluation over the exact cosine top-k with label-graded relevance — decimal-summed DCG terms, local-ideal normalization (ML-eval [ext])",
)
def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators import similarity as sim

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    top = (
        sim.knn_bruteforce(queries, emb, "q_id", "q_vec", "vec_id", "embedding", k=5)
        .join(F.broadcast(queries.select("q_id", "q_label")), "q_id")
        .join(emb.select("vec_id", "label"), "vec_id")
        .select(
            "q_id",
            F.when(F.col("q_label") == F.col("label"), 3)
            .when(F.col("q_label") % 4 == F.col("label") % 4, 1)
            .otherwise(0)
            .alias("rel"),
            "rank",
        )
    )
    # local-ideal re-rank of the SAME retrieved 5 (≤ 5 rows per query)
    iw = Window.partitionBy("q_id").orderBy(F.desc("rel"), F.asc("rank"))
    ideal = top.withColumn("irank", F.row_number().over(iw))
    dterm = F.round(
        (F.pow(F.lit(2.0), F.col("rel")) - 1)
        / (F.log(F.col("rank") + 1) / F.log(F.lit(2.0))),
        10,
    ).cast("decimal(18,10)")
    iterm = F.round(
        (F.pow(F.lit(2.0), F.col("rel")) - 1)
        / (F.log(F.col("irank") + 1) / F.log(F.lit(2.0))),
        10,
    ).cast("decimal(18,10)")
    agg = (
        ideal.withColumn("dterm", dterm)
        .withColumn("iterm", iterm)
        .groupBy("q_id")
        .agg(
            F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).cast("long").alias("n_rel"),
            F.sum("dterm").cast("double").alias("dcg"),
            F.sum("iterm").cast("double").alias("idcg"),
            F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("first_rel"),
        )
    )
    return agg.select(
        "q_id",
        "n_rel",
        F.round("dcg", 6).alias("dcg5"),
        F.round(
            F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg")).otherwise(0.0), 6
        ).alias("ndcg5"),
        F.round(F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)), 6).alias(
            "rr"
        ),
    ).orderBy("q_id")


# ---------------------------------------------------------------------------
# Propensity-score matching ([ext] causal — the matching member of the
# causal family next to DiD and CUPED).  Treated = BUILDING-segment
# customers; controls = everyone else; score = exact-decimal account
# balance; outcome = decimal total order spend (0 for orderless
# customers).  Matching is nation-BLOCKED 1-NN WITH replacement: in
# balance order the nearest control is the nearest preceding or
# following control row, so candidate generation is two
# last/first-ignore-nulls windows per nation — O(n log n) per block,
# never a treated × control pair join.  Distances compare in decimal
# (exact); prev wins ties.  ATT per nation = decimal-summed outcome
# gap / count, double at the boundary.
QPSM_ORACLE = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS y
  FROM orders GROUP BY o_custkey
), cust AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
         COALESCE(s.y, CAST(0 AS DECIMAL(28,2))) AS y
  FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey
), w AS (
  SELECT *,
         LAST_VALUE(CASE WHEN treated = 0 THEN bal END IGNORE NULLS)
           OVER (PARTITION BY c_nationkey ORDER BY bal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pbal,
         LAST_VALUE(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
           OVER (PARTITION BY c_nationkey ORDER BY bal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS py,
         FIRST_VALUE(CASE WHEN treated = 0 THEN bal END IGNORE NULLS)
           OVER (PARTITION BY c_nationkey ORDER BY bal, c_custkey
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nbal,
         FIRST_VALUE(CASE WHEN treated = 0 THEN y END IGNORE NULLS)
           OVER (PARTITION BY c_nationkey ORDER BY bal, c_custkey
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ny
  FROM cust
), matched AS (
  SELECT c_nationkey, bal, y,
         CASE WHEN pbal IS NULL AND nbal IS NULL THEN NULL
              WHEN nbal IS NULL THEN py
              WHEN pbal IS NULL THEN ny
              WHEN bal - pbal <= nbal - bal THEN py ELSE ny END AS my,
         CASE WHEN pbal IS NULL AND nbal IS NULL THEN NULL
              WHEN nbal IS NULL THEN bal - pbal
              WHEN pbal IS NULL THEN nbal - bal
              WHEN bal - pbal <= nbal - bal THEN bal - pbal
              ELSE nbal - bal END AS mdist
  FROM w WHERE treated = 1
)
SELECT n.n_name,
       CAST(COUNT(my) AS BIGINT) AS n_matched,
       ROUND(CAST(SUM(y - my) AS DOUBLE) / COUNT(my), 6) AS att,
       ROUND(CAST(SUM(mdist) AS DOUBLE) / COUNT(my), 6) AS avg_match_dist
FROM matched m JOIN nation n ON m.c_nationkey = n.n_nationkey
WHERE my IS NOT NULL
GROUP BY n.n_name
ORDER BY n.n_name
"""


@declare(
    "q_propensity_match",
    oracle=QPSM_ORACLE,
    description="nation-blocked 1-NN propensity matching on exact-decimal balance (with replacement, adjacency windows — no pair join) and per-nation ATT (causal [ext])",
)
def q_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders", "nation")
    spend = t["orders"].groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("y")
    )
    cust = (
        t["customer"]
        .join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias(
                "treated"
            ),
            F.coalesce(F.col("y"), F.lit(0).cast("decimal(28,2)")).alias("y"),
        )
    )
    order = Window.partitionBy("c_nationkey").orderBy("bal", "c_custkey")
    prev = order.rowsBetween(Window.unboundedPreceding, -1)
    nxt = order.rowsBetween(1, Window.unboundedFollowing)
    ctrl_bal = F.when(F.col("treated") == 0, F.col("bal"))
    ctrl_y = F.when(F.col("treated") == 0, F.col("y"))
    w = cust.select(
        "c_nationkey",
        "bal",
        "y",
        "treated",
        F.last(ctrl_bal, ignorenulls=True).over(prev).alias("pbal"),
        F.last(ctrl_y, ignorenulls=True).over(prev).alias("py"),
        F.first(ctrl_bal, ignorenulls=True).over(nxt).alias("nbal"),
        F.first(ctrl_y, ignorenulls=True).over(nxt).alias("ny"),
    ).filter(F.col("treated") == 1)
    take_prev = F.col("nbal").isNull() | (
        F.col("pbal").isNotNull()
        & (F.col("bal") - F.col("pbal") <= F.col("nbal") - F.col("bal"))
    )
    matched = w.select(
        "c_nationkey",
        "y",
        F.when(F.col("pbal").isNull() & F.col("nbal").isNull(), F.lit(None))
        .when(take_prev, F.col("py"))
        .otherwise(F.col("ny"))
        .alias("my"),
        F.when(F.col("pbal").isNull() & F.col("nbal").isNull(), F.lit(None))
        .when(take_prev, F.col("bal") - F.col("pbal"))
        .otherwise(F.col("nbal") - F.col("bal"))
        .alias("mdist"),
    ).filter(F.col("my").isNotNull())
    return (
        matched.join(
            F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy("n_name")
        .agg(
            F.count("my").cast("long").alias("n_matched"),
            F.round(
                F.sum(F.col("y") - F.col("my")).cast("double") / F.count("my"), 6
            ).alias("att"),
            F.round(F.sum("mdist").cast("double") / F.count("my"), 6).alias(
                "avg_match_dist"
            ),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# Neyman optimal allocation ([ext] survey design — the design-side
# complement of the Horvitz-Thompson estimator): allocate a fixed
# sample budget n=1000 across order-priority strata ∝ N_h·S_h, then
# round to integers by largest remainder so the allocations sum to
# exactly 1000.  S_h comes from exact DECIMAL(38,4) moments (the
# variance formula is one double expression over exact inputs); each
# stratum weight is rounded to 6 decimals and re-enters the exact
# decimal domain before the shares, so floor/remainder arithmetic sees
# bit-identical inputs in both engines.  One grouped scan; everything
# after runs on #strata rows.
QNEYMAN_ORACLE = """
WITH s AS (
  SELECT o_orderpriority AS stratum,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sq
  FROM orders GROUP BY 1
), wts AS (
  SELECT stratum, n,
         SQRT((sq - sm * sm / n) / n) AS sd,
         CAST(ROUND(n * SQRT((sq - sm * sm / n) / n), 6) AS DECIMAL(28,6)) AS w
  FROM s
), shares AS (
  SELECT stratum, n, sd, w,
         CAST(w AS DOUBLE) / CAST(SUM(w) OVER () AS DOUBLE) AS share
  FROM wts
), base AS (
  SELECT stratum, n, sd, share,
         CAST(FLOOR(1000 * share) AS BIGINT) AS b,
         1000 * share - FLOOR(1000 * share) AS rem
  FROM shares
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rem DESC, stratum) AS rk,
         CAST(1000 - SUM(b) OVER () AS BIGINT) AS extra
  FROM base
)
SELECT stratum,
       CAST(n AS BIGINT) AS n_orders,
       ROUND(sd, 6) AS sd_price,
       ROUND(share, 6) AS neyman_share,
       CAST(b + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM ranked
ORDER BY stratum
"""


@declare(
    "q_neyman_allocation",
    oracle=QNEYMAN_ORACLE,
    description="Neyman optimal sample allocation across priority strata (n_h ∝ N_h·S_h from exact decimal moments) with largest-remainder rounding to exactly n=1000 (survey design [ext])",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("sm"),
        F.sum(dec * dec).cast("double").alias("sq"),
    )
    sd = F.sqrt((F.col("sq") - F.col("sm") * F.col("sm") / F.col("n")) / F.col("n"))
    wts = s.select(
        "stratum",
        "n",
        sd.alias("sd"),
        F.round(F.col("n") * sd, 6).cast("decimal(28,6)").alias("w"),
    )
    # everything below runs on #strata rows — the single-partition
    # windows are bounded by the stratum count, not the data
    tot = Window.partitionBy()
    shares = wts.withColumn(
        "share", F.col("w").cast("double") / F.sum("w").over(tot).cast("double")
    )
    base = shares.select(
        "stratum",
        "n",
        "sd",
        "share",
        F.floor(1000 * F.col("share")).cast("long").alias("b"),
        (1000 * F.col("share") - F.floor(1000 * F.col("share"))).alias("rem"),
    )
    rw = Window.orderBy(F.desc("rem"), F.asc("stratum"))
    ranked = base.withColumn("rk", F.row_number().over(rw)).withColumn(
        "extra", (F.lit(1000) - F.sum("b").over(tot)).cast("long")
    )
    return ranked.select(
        "stratum",
        F.col("n").cast("long").alias("n_orders"),
        F.round("sd", 6).alias("sd_price"),
        F.round("share", 6).alias("neyman_share"),
        (F.col("b") + F.when(F.col("rk") <= F.col("extra"), 1).otherwise(0))
        .cast("long")
        .alias("alloc"),
    ).orderBy("stratum")


# ---------------------------------------------------------------------------
# Incremental MIN/MAX maintenance under CDC ([ext] IVM — the
# non-self-maintainable case q_incremental_agg's SUM/COUNT form cannot
# cover: deleting the extremum forces a per-key repair).  Same
# deterministic Δ recipe as q_incremental_agg (delete %13, reprice
# %5 +50.25, insert clone %9 +7.5); the oracle IS the maintained
# invariant — recompute MIN/MAX/COUNT from scratch over the changed
# table.  The operator self-maintains clean keys from the delta alone
# and rescans ONLY the dirty keys (removal touched the stored
# extremum, new key, emptied key) via a keyed semi-join of the
# post-change fact — change-batch-bounded at any scale.
QMINMAX_ORACLE = """
WITH surviving AS (
  SELECT * FROM orders WHERE o_orderkey % 13 <> 0
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
)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(MIN(price) AS DECIMAL(28,4)) AS DOUBLE) AS min_price,
       CAST(CAST(MAX(price) AS DECIMAL(28,4)) AS DOUBLE) AS max_price
FROM t2
GROUP BY o_custkey
ORDER BY o_custkey
"""


@declare(
    "q_incremental_minmax",
    oracle=QMINMAX_ORACLE,
    description="incrementally maintained MIN/MAX/COUNT rollup from a CDC delta with dirty-key-bounded rescan — the non-self-maintainable IVM case; oracle recomputes from scratch (CDC [ext])",
)
def q_incremental_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.cdc import incremental_minmax_apply

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    dec_price = F.col("o_totalprice").cast("decimal(28,4)")
    base_agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(dec_price).alias("min_v"),
        F.max(dec_price).alias("max_v"),
    )
    deletes = orders.filter(F.col("o_orderkey") % 13 == 0).select(
        F.lit("d").alias("op"),
        "o_custkey",
        dec_price.alias("before_v"),
        F.lit(None).cast("decimal(28,4)").alias("after_v"),
    )
    surviving = orders.filter(F.col("o_orderkey") % 13 != 0)
    updates = surviving.filter(F.col("o_orderkey") % 5 == 0).select(
        F.lit("u").alias("op"),
        "o_custkey",
        dec_price.alias("before_v"),
        (dec_price + F.lit("50.25").cast("decimal(28,4)")).alias("after_v"),
    )
    inserts = surviving.filter(F.col("o_orderkey") % 9 == 0).select(
        F.lit("c").alias("op"),
        "o_custkey",
        F.lit(None).cast("decimal(28,4)").alias("before_v"),
        (dec_price + F.lit("7.5").cast("decimal(28,4)")).alias("after_v"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    # the post-change fact table the dirty-key rescan reads
    repriced = surviving.select(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            dec_price + F.lit("50.25").cast("decimal(28,4)"),
        )
        .otherwise(dec_price)
        .alias("price"),
    )
    inserted = (
        surviving.filter(F.col("o_orderkey") % 9 == 0)
        .select(
            "o_custkey",
            (dec_price + F.lit("7.5").cast("decimal(28,4)")).alias("price"),
        )
    )
    new_fact = repriced.unionByName(inserted)
    out = incremental_minmax_apply(
        base_agg, changes, new_fact, keys=["o_custkey"], value_col="price"
    )
    return out.select(
        "o_custkey",
        "n",
        F.col("min_v").cast("decimal(28,4)").cast("double").alias("min_price"),
        F.col("max_v").cast("decimal(28,4)").cast("double").alias("max_price"),
    ).orderBy("o_custkey")


# ---------------------------------------------------------------------------
# Directed n-gram CONTAINMENT pairs ([ext] dedup — the asymmetric
# measure: |A∩B|/|A| catches a small doc embedded in a large one,
# which symmetric Jaccard structurally misses).  The Spark side is
# operators/dedup.ngram_containment_pairs (probe-side prefix filter,
# full inverted index on the contained-in side, exact verify); the
# oracle is the brute-force exploded-gram join.  Shingle SQL mirrors
# queries/llm.py's proven _TOKS macro (identical normalization and
# slice clamping to operators/dedup.shingles).  Both sides threshold
# the ROUNDED containment, so the boundary comparison is identical.
_NORM9 = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS9 = f"string_split({_NORM9}, ' ')"

QCONTAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS9} AS words FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(words) - 2, 1) + 1),
           i -> array_to_string(words[i:i+2], ' ')
         )) AS s
  FROM toks
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), sz AS (
  SELECT doc_id, len(s) AS n FROM sh
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_grams_a, containment FROM (
  SELECT c.id_a, c.id_b, CAST(sa.n AS BIGINT) AS n_grams_a,
         ROUND(CAST(c.inter AS DOUBLE) / CAST(sa.n AS DOUBLE), 6) AS containment
  FROM cand c JOIN sz sa ON sa.doc_id = c.id_a
)
WHERE containment >= 0.5
ORDER BY id_a, id_b
"""


@declare(
    "q_containment_pairs",
    oracle=QCONTAIN_ORACLE,
    description="directed n-gram containment pairs (|A∩B|/|A| ≥ 0.5) via asymmetric prefix filtering — catches small-doc-inside-big-doc duplication Jaccard misses (dedup [ext])",
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import ngram_containment_pairs

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return ngram_containment_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).orderBy("id_a", "id_b")
