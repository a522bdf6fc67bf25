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
  estimator;
- incremental MIN/MAX maintenance under CDC with dirty-key-bounded
  repair — the non-self-maintainable IVM case;
- directed n-gram containment pairs — the asymmetric dedup measure
  (small doc inside big doc) Jaccard structurally misses;
- A/B power analysis (minimum detectable effect) — the pre-test
  experimentation-design question;
- Zipf rank-frequency slope per source — the natural-language sanity
  check for a text source, via salted two-phase top-k;
- winsorized/trimmed means — clamp-vs-drop robust statistics from
  the distinct-value ECDF;
- md5-mode HyperLogLog with union-by-register-max merge — the
  verifiable twin of the Datasketches HLL rollup;
- decision-stump split finding by weighted Gini — the distributed
  GBDT/tree-learning primitive, counts-first over the value domain;
- two-feature OLS solved in closed form from exact decimal
  sufficient statistics — non-iterative in-engine regression;
- one-round bipartite label propagation — majority-vote
  semi-supervised labeling on the customer→supplier graph;
- effective sample size of importance weights — the
  mixture-reweighting collapse diagnostic;
- split-conformal prediction quantiles — finite-sample-valid
  intervals from integer-exact ECDF ranks.

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
# the identical expression tree (single-sourced from round6b so the
# cross-engine parity contract has one auditable copy).
from jibaro_spark.queries.round6b import _HAVERSINE_SQL as _HAV_SQL  # noqa: E402

QGEO_NN_ORACLE = f"""
WITH c AS (
  SELECT c_custkey,
         ((c_custkey * 37 % 12000) / 100.0) - 60.0 AS clat,
         ((c_custkey * 91 % 36000) / 100.0) - 180.0 AS clon
  FROM customer WHERE c_custkey IS NOT NULL
), s AS (
  SELECT s_suppkey,
         ((s_suppkey * 67 % 12000) / 100.0) - 60.0 AS slat,
         ((s_suppkey * 149 % 36000) / 100.0) - 180.0 AS slon
  FROM supplier WHERE s_suppkey IS NOT NULL
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
    # NULL contract (relational fuzz sweep): synthetic coordinates are
    # key-derived — a NULL key is a point with no position
    t["customer"] = t["customer"].filter(F.col("c_custkey").isNotNull())
    t["supplier"] = t["supplier"].filter(F.col("s_suppkey").isNotNull())
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
    # NULL contract (relational fuzz sweep): same fence as
    # q_incremental_agg — a NULL orderkey escapes both modulo filters
    orders = orders.filter(
        F.col("o_orderkey").isNotNull()
        & F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
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
# oracle is the brute-force exploded-gram join.  Shingle SQL reuses
# queries/llm.py's proven _TOKS macro (identical normalization and
# slice clamping to operators/dedup.shingles) so the normalization
# regex has a single auditable copy.  Both sides threshold the
# ROUNDED containment, so the boundary comparison is identical.
from jibaro_spark.queries.llm import _TOKS as _TOKS9  # noqa: E402
from jibaro_spark.queries.llm import _zipgrams  # noqa: E402

QCONTAIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS9} AS words FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct({_zipgrams('words', 3)}) AS s
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

    # NULL text has no shingles (NULL-fuzz sweep)
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    return ngram_containment_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# A/B power analysis: minimum detectable effect ([ext] experimentation
# design — the question asked BEFORE the test runs, completing the
# family around q_srm_check / q_ab_welch_ttest / q_cuped_adjust).  Per
# priority: md5-nibble 50/50 arms (the q_srm_check split), pooled sd
# from exact DECIMAL(38,4) moments, and the two-sided α=0.05 /
# 80%-power MDE = (z_{α/2}+z_β)·sd·√(1/n_a+1/n_b) with the z literals
# written identically in both engines.  One grouped scan; the MDE is
# a single double expression over exact integer/decimal inputs.
QMDE_ORACLE = """
WITH s AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
                       IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sq
  FROM orders GROUP BY 1
), m AS (
  SELECT o_orderpriority, n_a, n - n_a AS n_b,
         SQRT((sq - sm * sm / n) / (n - 1)) AS sd,
         sm / n AS mean
  FROM s
)
SELECT o_orderpriority, n_a, n_b,
       ROUND(sd, 6) AS sd_price,
       ROUND((1.959964 + 0.841621) * sd
             * SQRT(1.0 / n_a + 1.0 / n_b), 6) AS mde_abs,
       ROUND((1.959964 + 0.841621) * sd
             * SQRT(1.0 / n_a + 1.0 / n_b) / mean, 6) AS mde_rel
FROM m
ORDER BY o_orderpriority
"""


@declare(
    "q_ab_power_mde",
    oracle=QMDE_ORACLE,
    description="pre-test A/B power analysis: minimum detectable effect per priority at α=0.05 / 80% power from exact decimal moments and the md5 arm split (experimentation [ext])",
)
def q_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    in_a = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin(
        *"01234567"
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(in_a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(dec).cast("double").alias("sm"),
        F.sum(dec * dec).cast("double").alias("sq"),
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt((F.col("sq") - F.col("sm") * F.col("sm") / nd) / (nd - 1))
    mean = F.col("sm") / nd
    n_b = (F.col("n") - F.col("n_a")).cast("long")
    half = (
        F.lit(1.959964 + 0.841621)
        * sd
        * F.sqrt(1.0 / F.col("n_a") + 1.0 / n_b.cast("double"))
    )
    return s.select(
        "o_orderpriority",
        "n_a",
        n_b.alias("n_b"),
        F.round(sd, 6).alias("sd_price"),
        F.round(half, 6).alias("mde_abs"),
        F.round(half / mean, 6).alias("mde_rel"),
    ).orderBy("o_orderpriority")


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope per source ([ext] corpus statistics — the
# canonical sanity check that a text source is natural-language-like:
# ln(freq) vs ln(rank) over the top-50 terms should fall near slope
# −1; synthetic or templated sources flatten or step).  Token counts
# are exact; top-50 per source is a SALTED two-phase top-k (local
# top-50 per (source, 64-way token-hash salt), then rank the ≤ 64·50
# survivors — the global top-50 is provably inside the salted union,
# and no task ever sorts a full per-source vocabulary).  The OLS
# slope runs on 50 rows per source with round(ln·,10)→decimal sums.
QZIPF_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_TOKS9}) AS tok
  FROM documents
), freq AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS f
  FROM toks WHERE tok <> '' GROUP BY 1, 2
), ranked AS (
  SELECT source, tok, f,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY f DESC, tok) AS r
  FROM freq
), top AS (
  SELECT source,
         CAST(ROUND(LN(r), 10) AS DECIMAL(18,10)) AS x,
         CAST(ROUND(LN(f), 10) AS DECIMAL(18,10)) AS y
  FROM ranked WHERE r <= 50
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,20))) AS DOUBLE) AS sxy
  FROM top GROUP BY source
)
SELECT source, n AS n_terms,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
FROM s
ORDER BY source
"""


@declare(
    "q_zipf_slope",
    oracle=QZIPF_ORACLE,
    description="Zipf rank-frequency log-log OLS slope of the top-50 terms per source — salted two-phase top-k, decimal ln sums (corpus stats [ext])",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    freq = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    # salted two-phase top-k: the global top-50 per source is inside
    # the union of per-salt local top-50s, so no task sorts a full
    # per-source vocabulary (same discipline as the ES-sampling and
    # KMV bottom-k rewrites)
    w_local = Window.partitionBy("source", "__salt").orderBy(
        F.desc("f"), F.asc("tok")
    )
    pruned = (
        freq.withColumn("__salt", F.pmod(F.xxhash64("tok"), F.lit(64)))
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= 50)
    )
    w_global = Window.partitionBy("source").orderBy(F.desc("f"), F.asc("tok"))
    top = (
        pruned.withColumn("r", F.row_number().over(w_global))
        .filter(F.col("r") <= 50)
        .select(
            "source",
            F.round(F.log("r"), 10).cast("decimal(18,10)").alias("x"),
            F.round(F.log("f"), 10).cast("decimal(18,10)").alias("y"),
        )
    )
    s = top.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,20)"))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,20)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "source",
        F.col("n").alias("n_terms"),
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (nd * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Winsorized and trimmed means ([ext] robust stats — the clamp-vs-drop
# pair next to the MAD screen): per return flag, the 10th/90th
# percentile thresholds come from the distinct-price ECDF (counts
# collapse first, type-1 quantile by integer rank comparison — the KS
# machinery's shape), values clamp (winsorize) or drop (trim) against
# the exact decimal thresholds, and both means are decimal-sum /
# count in double.  No windows over line items — only over distinct
# prices per flag.
QWINSOR_ORACLE = """
WITH d AS (
  SELECT l_returnflag AS flag, CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem
  WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
  GROUP BY 1, 2
), e AS (
  SELECT flag, v, c,
         SUM(c) OVER (PARTITION BY flag ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY flag) AS n
  FROM d
), th AS (
  SELECT flag,
         MIN(CASE WHEN cum * 10 >= n THEN v END) AS lo,
         MIN(CASE WHEN cum * 10 >= n * 9 THEN v END) AS hi,
         CAST(MAX(n) AS BIGINT) AS n
  FROM e GROUP BY flag
), agg AS (
  SELECT d.flag, t.lo, t.hi, t.n,
         SUM(d.c * CASE WHEN d.v < t.lo THEN t.lo
                        WHEN d.v > t.hi THEN t.hi
                        ELSE d.v END) AS wsum,
         SUM(CASE WHEN d.v >= t.lo AND d.v <= t.hi THEN d.c ELSE 0 END) AS tn,
         SUM(CASE WHEN d.v >= t.lo AND d.v <= t.hi THEN d.c * d.v END) AS tsum
  FROM d JOIN th t ON t.flag = d.flag
  GROUP BY 1, 2, 3, 4
)
SELECT flag,
       CAST(lo AS DOUBLE) AS p10,
       CAST(hi AS DOUBLE) AS p90,
       ROUND(CAST(wsum AS DOUBLE) / n, 6) AS winsorized_mean,
       ROUND(CAST(tsum AS DOUBLE) / tn, 6) AS trimmed_mean,
       CAST(tn AS BIGINT) AS n_kept
FROM agg
ORDER BY flag
"""


@declare(
    "q_winsorized_stats",
    oracle=QWINSOR_ORACLE,
    description="winsorized (clamp) and trimmed (drop) means per return flag with type-1 decile thresholds from the distinct-price ECDF — counts-first, decimal-exact (robust stats [ext])",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): the ECDF axis must be
    # defined — a NULL price sorts to opposite ends of the cum windows
    li = li.filter(
        F.col("l_returnflag").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    # project + hash-spread before the distinct-(flag, price) count
    # agg (r12 — the moment-pass treatment; the partials otherwise run
    # on the single-row-group scan's ONE core).  A flag-keyed exchange
    # for the ECDF windows was ALSO tried and ABAB-measured worse (see
    # the NOTE below) — only the spread is applied.
    from jibaro_spark.operators.util import ensure_parallelism

    li = ensure_parallelism(
        li.select("l_returnflag", "l_extendedprice"), by="l_extendedprice"
    )
    d = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # NOTE (r12): a flag-keyed dense_exchange here ABAB-measured WORSE
    # (+0.1-0.4 — 3 distinct flags buy ≤3 tasks for a real extra
    # shuffle); the input spread above is the win (q_weighted_median
    # precedent, same table/shape).
    cum_w = (
        Window.partitionBy("flag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flag_w = Window.partitionBy("flag")
    e = d.select(
        "flag",
        "v",
        "c",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(flag_w).alias("n"),
    )
    th = e.groupBy("flag").agg(
        F.min(F.when(F.col("cum") * 10 >= F.col("n"), F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") * 10 >= F.col("n") * 9, F.col("v"))).alias("hi"),
        F.max("n").cast("long").alias("n"),
    )
    joined = d.join(th, "flag")
    wv = (
        F.when(F.col("v") < F.col("lo"), F.col("lo"))
        .when(F.col("v") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("v"))
    )
    kept = (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    agg = joined.groupBy("flag", "lo", "hi", "n").agg(
        F.sum(F.col("c") * wv).alias("wsum"),
        F.sum(F.when(kept, F.col("c")).otherwise(0)).alias("tn"),
        F.sum(F.when(kept, F.col("c") * F.col("v"))).alias("tsum"),
    )
    return agg.select(
        "flag",
        F.col("lo").cast("double").alias("p10"),
        F.col("hi").cast("double").alias("p90"),
        F.round(F.col("wsum").cast("double") / F.col("n"), 6).alias(
            "winsorized_mean"
        ),
        F.round(F.col("tsum").cast("double") / F.col("tn"), 6).alias(
            "trimmed_mean"
        ),
        F.col("tn").cast("long").alias("n_kept"),
    ).orderBy("flag")


# ---------------------------------------------------------------------------
# md5-verifiable HyperLogLog ([ext] sketches — the HLL twin of r6's
# q_cms_heavy_hitters_md5, shrinking the rows-only set: the production
# q_hll_mergeable_distinct uses Spark's Datasketches HLL whose
# estimates are engine-specific, so THIS query runs the whole register
# pipeline in portable arithmetic).  h = md5(key): first 2 hex digits
# → bucket (m=256), next 14 hex digits → a 56-bit word whose
# leading-zero count is derived by EXACT string/integer ops (strip
# leading '0' hex digits; the first nonzero digit contributes 0-3
# bits) — no float log2, which is off-by-ulp at exact powers of two.
# Z = Σ 2^(−M_j) is computed as an exact integer Σ 2^(57−M_j) in
# DECIMAL (≤ 256·2^57 < 2^66), one double division at the end; absent
# buckets contribute 2^57.  The raw (uncorrected) HLL estimator with
# α_256 written as the same literal expression both sides; the merged
# row demonstrates HLL's union law — per-bucket MAX of the per-group
# registers IS the union sketch, no rescan.
_HLL_RHO_SQL = """
CASE WHEN stripped = '' THEN 57
     ELSE 4 * (14 - LENGTH(stripped))
          + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
                 WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
                 WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 1
                 ELSE 0 END
          + 1 END
"""

QHLLMD5_ORACLE = f"""
WITH h AS (
  SELECT o_orderstatus AS grp, md5(CAST(o_custkey AS VARCHAR)) AS hx
  FROM orders
), parts AS (
  SELECT grp,
         CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS bucket,
         regexp_replace(substr(hx, 3, 14), '^0+', '') AS stripped
  FROM h
), regs AS (
  SELECT grp, bucket, CAST(MAX({_HLL_RHO_SQL}) AS BIGINT) AS m
  FROM parts GROUP BY 1, 2
), zsum AS (
  SELECT grp,
         CAST(SUM(CAST(CAST(1 AS BIGINT) << CAST(57 - m AS INTEGER) AS DECIMAL(38,0)))
              + (256 - COUNT(*)) * CAST(CAST(1 AS BIGINT) << 57 AS DECIMAL(38,0))
              AS DECIMAL(38,0)) AS zint,
         CAST(COUNT(*) AS BIGINT) AS n_regs
  FROM regs GROUP BY grp
), uregs AS (
  SELECT bucket, MAX(m) AS m FROM regs GROUP BY bucket
), uz AS (
  SELECT CAST(SUM(CAST(CAST(1 AS BIGINT) << CAST(57 - m AS INTEGER) AS DECIMAL(38,0)))
              + (256 - COUNT(*)) * CAST(CAST(1 AS BIGINT) << 57 AS DECIMAL(38,0))
              AS DECIMAL(38,0)) AS zint
  FROM uregs
), ex AS (
  SELECT o_orderstatus AS grp, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
  FROM orders GROUP BY 1
)
SELECT z.grp, z.n_regs,
       ROUND((0.7213 / (1 + 1.079 / 256)) * 256 * 256
             / (CAST(z.zint AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 57 AS DOUBLE)), 6)
         AS hll_estimate,
       e.exact_custs,
       ROUND((0.7213 / (1 + 1.079 / 256)) * 256 * 256
             / (CAST(u.zint AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 57 AS DOUBLE)), 6)
         AS union_estimate
FROM zsum z JOIN ex e ON e.grp = z.grp CROSS JOIN uz u
ORDER BY z.grp
"""


@declare(
    "q_hll_union_md5",
    oracle=QHLLMD5_ORACLE,
    description="md5-mode HyperLogLog: portable register pipeline (exact leading-zero arithmetic, integer-exact Z sums) per order status + union-by-register-max merge — the verifiable twin of the Datasketches HLL rollup (sketches [ext])",
)
def q_hll_union_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    hx = F.md5(F.col("o_custkey").cast("string"))
    parts = o.select(
        F.col("o_orderstatus").alias("grp"),
        F.conv(F.substring(hx, 1, 2), 16, 10).cast("long").alias("bucket"),
        F.regexp_replace(F.substring(hx, 3, 14), "^0+", "").alias("stripped"),
    )
    first = F.substring("stripped", 1, 1)
    rho = F.when(F.col("stripped") == "", 57).otherwise(
        4 * (14 - F.length("stripped"))
        + F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + 1
    )
    regs = parts.withColumn("rho", rho).groupBy("grp", "bucket").agg(
        F.max("rho").cast("long").alias("m")
    )
    # F.shiftleft takes a literal bit count; the per-row shift needs expr()
    term = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(57 - m AS INT))").cast(
        "decimal(38,0)"
    )
    full = F.shiftleft(F.lit(1).cast("long"), 57).cast("decimal(38,0)")

    def zint(df, keys):
        return df.groupBy(*keys).agg(
            (F.sum(term) + (256 - F.count(F.lit(1))) * full)
            .cast("decimal(38,0)")
            .alias("zint"),
            F.count(F.lit(1)).cast("long").alias("n_regs"),
        )

    alpha_mm = F.lit(0.7213 / (1 + 1.079 / 256)) * 256 * 256
    denom = F.col("zint").cast("double") / F.shiftleft(
        F.lit(1).cast("long"), 57
    ).cast("double")
    zsum = zint(regs, ["grp"])
    # union law: per-bucket MAX across groups IS the union sketch
    uregs = regs.groupBy("bucket").agg(F.max("m").alias("m"))
    uz = zint(uregs, []).select(
        F.round(alpha_mm / denom, 6).alias("union_estimate")
    )
    ex = o.groupBy(F.col("o_orderstatus").alias("grp")).agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_custs")
    )
    return (
        zsum.join(ex, "grp")
        .crossJoin(F.broadcast(uz))
        .select(
            "grp",
            "n_regs",
            F.round(alpha_mm / denom, 6).alias("hll_estimate"),
            "exact_custs",
            "union_estimate",
        )
        .orderBy("grp")
    )


# ---------------------------------------------------------------------------
# Decision-stump split finding ([ext] in-engine ML training — THE
# distributed-GBDT primitive: per group, the price threshold that best
# separates high-priority orders by weighted Gini impurity).  Counts
# collapse to distinct (group, price) rows FIRST (the KS /
# weighted-median shape: the cumulative window runs over the
# value-domain-bounded distinct table, never the order volume); class
# counts are exact integers, the Gini score is one double expression
# over them ROUNDED TO 10 before the argmin rank, and ties break on
# the smaller threshold — engine-invariant split choice.
QGINI_ORACLE = """
WITH d AS (
  SELECT o_orderstatus AS grp,
         CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS npos
  FROM orders
  WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1, 2
), c AS (
  SELECT grp, v,
         SUM(n) OVER (PARTITION BY grp ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
         SUM(npos) OVER (PARTITION BY grp ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pl,
         SUM(n) OVER (PARTITION BY grp) AS nt,
         SUM(npos) OVER (PARTITION BY grp) AS pt
  FROM d
), scored AS (
  SELECT grp, v, nl, pl, nt, pt,
         ROUND(
           (CAST(nl AS DOUBLE) / nt)
             * (1 - (CAST(pl AS DOUBLE) / nl) * (CAST(pl AS DOUBLE) / nl)
                  - (CAST(nl - pl AS DOUBLE) / nl) * (CAST(nl - pl AS DOUBLE) / nl))
           + (CAST(nt - nl AS DOUBLE) / nt)
             * (1 - (CAST(pt - pl AS DOUBLE) / (nt - nl)) * (CAST(pt - pl AS DOUBLE) / (nt - nl))
                  - (CAST((nt - nl) - (pt - pl) AS DOUBLE) / (nt - nl))
                    * (CAST((nt - nl) - (pt - pl) AS DOUBLE) / (nt - nl))),
           10) AS wg
  FROM c WHERE nl < nt
), best AS (
  SELECT grp, v, nl, pl, wg,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY wg, v) AS rk,
         MAX(nt) OVER (PARTITION BY grp) AS nt,
         MAX(pt) OVER (PARTITION BY grp) AS pt
  FROM scored
)
SELECT grp,
       CAST(v AS DOUBLE) AS best_threshold,
       CAST(nl AS BIGINT) AS left_n,
       CAST(pl AS BIGINT) AS left_pos,
       ROUND((1 - (CAST(pt AS DOUBLE) / nt) * (CAST(pt AS DOUBLE) / nt)
                - (CAST(nt - pt AS DOUBLE) / nt) * (CAST(nt - pt AS DOUBLE) / nt))
             - wg, 6) AS gini_gain
FROM best WHERE rk = 1
ORDER BY grp
"""


@declare(
    "q_gini_split",
    oracle=QGINI_ORACLE,
    description="decision-stump split finding per order status: best price threshold by weighted Gini over distinct-value class counts — the distributed-GBDT primitive, counts-first (ML training [ext])",
)
def q_gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): a NULL threshold value has
    # no position on the split axis (and sorts opposite ways in the
    # Spark vs SQL cumulative windows); a NULL group is not a stump
    o = o.filter(
        F.col("o_orderstatus").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    d = o.groupBy(
        F.col("o_orderstatus").alias("grp"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)
        )
        .cast("long")
        .alias("npos"),
    )
    cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("grp")
    c = d.select(
        "grp",
        "v",
        F.sum("n").over(cum).alias("nl"),
        F.sum("npos").over(cum).alias("pl"),
        F.sum("n").over(tot).alias("nt"),
        F.sum("npos").over(tot).alias("pt"),
    )
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nt, pt = F.col("nt").cast("double"), F.col("pt").cast("double")
    nr, pr = nt - nl, pt - pl
    wg = F.round(
        (nl / nt) * (1 - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl))
        + (nr / nt) * (1 - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)),
        10,
    )
    scored = c.filter(F.col("nl") < F.col("nt")).withColumn("wg", wg)
    rk = Window.partitionBy("grp").orderBy("wg", "v")
    best = scored.withColumn("rk", F.row_number().over(rk)).filter(F.col("rk") == 1)
    base = 1 - (pt / nt) * (pt / nt) - ((nt - pt) / nt) * ((nt - pt) / nt)
    return best.select(
        "grp",
        F.col("v").cast("double").alias("best_threshold"),
        F.col("nl").cast("long").alias("left_n"),
        F.col("pl").cast("long").alias("left_pos"),
        F.round(base - F.col("wg"), 6).alias("gini_gain"),
    ).orderBy("grp")


# ---------------------------------------------------------------------------
# Two-feature OLS per nation ([ext] in-engine ML — multivariate
# regression from sufficient statistics, the closed-form sibling of
# the gradient logreg trainer: spend ~ acctbal + n_orders).  All
# sufficient statistics (Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y,
# Σy²) accumulate as EXACT decimals in one grouped scan; the centered
# 2×2 normal-equation solve is a handful of double expressions over
# those exact sums — no iteration, no shuffle beyond the two keyed
# aggs, deterministic in any engine.
QOLS2_ORACLE = """
WITH per_cust AS (
  SELECT c.c_nationkey AS nk,
         CAST(c.c_acctbal AS DECIMAL(18,2)) AS x1,
         CAST(COUNT(o.o_orderkey) AS BIGINT) AS x2,
         CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(28,2)) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_nationkey IS NOT NULL AND c.c_acctbal IS NOT NULL
  GROUP BY c.c_nationkey, c.c_custkey, c.c_acctbal
), s AS (
  SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1, CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,4))) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS s22,
         CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,2))) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x1 * y AS DECIMAL(38,4))) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 * y AS DECIMAL(38,2))) AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM per_cust GROUP BY nk
), m AS (
  SELECT nk, n,
         s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
         s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
         s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy,
         s1 / n AS m1, s2 / n AS m2, sy / n AS my
  FROM s
)
SELECT nk AS nationkey, n,
       ROUND((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 6) AS beta_acctbal,
       ROUND((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 6) AS beta_orders,
       ROUND(my - (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * m1
                - (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * m2, 6)
         AS intercept,
       ROUND(((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * c1y
              + (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * c2y) / cyy, 6)
         AS r2
FROM m
WHERE c11 * c22 - c12 * c12 <> 0 AND cyy <> 0
ORDER BY nationkey
"""


@declare(
    "q_ols_two_feature",
    oracle=QOLS2_ORACLE,
    description="per-nation two-feature OLS (spend ~ acctbal + n_orders) solved in closed form from exact decimal sufficient statistics — no iteration, two keyed aggs (ML training [ext])",
)
def q_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        # NULL contract (relational fuzz sweep): the regression needs a
        # defined group and regressor; degenerate groups (zero design
        # variance — e.g. a single-customer nation) are filtered below
        # rather than divided by det=0 under ANSI
        t["customer"]
        .filter(F.col("c_nationkey").isNotNull() & F.col("c_acctbal").isNotNull())
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_nationkey", "c_custkey", "c_acctbal")
        .agg(
            F.count("o_orderkey").cast("long").alias("x2"),
            F.coalesce(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), F.lit(0)
            )
            .cast("decimal(28,2)")
            .alias("y"),
        )
        .select(
            F.col("c_nationkey").alias("nk"),
            F.col("c_acctbal").cast("decimal(18,2)").alias("x1"),
            "x2",
            "y",
        )
    )
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    s = per_cust.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x1).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x1 * x1).cast("decimal(38,4)")).cast("double").alias("s11"),
        F.sum((x2 * x2).cast("decimal(38,0)")).cast("double").alias("s22"),
        F.sum((x1 * x2).cast("decimal(38,2)")).cast("double").alias("s12"),
        F.sum((x1 * y).cast("decimal(38,4)")).cast("double").alias("s1y"),
        F.sum((x2 * y).cast("decimal(38,2)")).cast("double").alias("s2y"),
        F.sum((y * y).cast("decimal(38,4)")).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    c11 = F.col("s11") - F.col("s1") * F.col("s1") / n
    c22 = F.col("s22") - F.col("s2") * F.col("s2") / n
    c12 = F.col("s12") - F.col("s1") * F.col("s2") / n
    c1y = F.col("s1y") - F.col("s1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("s2") * F.col("sy") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = c11 * c22 - c12 * c12
    b1 = (c22 * c1y - c12 * c2y) / det
    b2 = (c11 * c2y - c12 * c1y) / det
    s = s.filter((det != 0) & (cyy != 0))
    return s.select(
        F.col("nk").alias("nationkey"),
        "n",
        F.round(b1, 6).alias("beta_acctbal"),
        F.round(b2, 6).alias("beta_orders"),
        F.round(
            F.col("sy") / n - b1 * F.col("s1") / n - b2 * F.col("s2") / n, 6
        ).alias("intercept"),
        F.round((b1 * c1y + b2 * c2y) / cyy, 6).alias("r2"),
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Bipartite label propagation, one round ([ext] semi-supervised
# labeling — the graph family's labeling member next to BFS / SSSP /
# PageRank / CC): each supplier takes the majority market segment of
# the DISTINCT customers it has served (lineitem → orders → customer),
# ties broken alphabetically.  Scale: two fact-keyed equi-joins, a
# distinct collapse to (supplier, customer, segment), and a
# supplier-keyed vote count + argmax window over ≤ 5 segment rows per
# supplier — never a per-supplier scan of the fact table.
QLP_ORACLE = """
WITH served AS (
  SELECT DISTINCT l.l_suppkey AS sk, c.c_custkey, c.c_mktsegment AS seg
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
), votes AS (
  SELECT sk, seg, CAST(COUNT(*) AS BIGINT) AS v
  FROM served GROUP BY 1, 2
), ranked AS (
  SELECT sk, seg, v,
         CAST(SUM(v) OVER (PARTITION BY sk) AS BIGINT) AS n_customers,
         ROW_NUMBER() OVER (PARTITION BY sk ORDER BY v DESC, seg) AS rk
  FROM votes
)
SELECT sk AS s_suppkey, seg AS propagated_segment, v AS votes, n_customers
FROM ranked WHERE rk = 1
ORDER BY s_suppkey
"""


@declare(
    "q_label_propagation",
    oracle=QLP_ORACLE,
    description="one-round bipartite label propagation: each supplier takes the majority market segment of its distinct served customers, alphabetical tie-break (graph labeling [ext])",
)
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    served = (
        t["lineitem"]
        .select(F.col("l_suppkey").alias("sk"), "l_orderkey")
        .join(
            t["orders"].select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            t["customer"].select("c_custkey", F.col("c_mktsegment").alias("seg")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("sk", "c_custkey", "seg")
        .distinct()
    )
    votes = served.groupBy("sk", "seg").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    sw = Window.partitionBy("sk")
    rk = Window.partitionBy("sk").orderBy(F.desc("v"), F.asc("seg"))
    return (
        votes.withColumn("n_customers", F.sum("v").over(sw).cast("long"))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            F.col("sk").alias("s_suppkey"),
            F.col("seg").alias("propagated_segment"),
            F.col("v").alias("votes"),
            "n_customers",
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Effective sample size of importance weights ([ext] training-data
# reweighting diagnostics — the number that says whether a domain
# mixture/temperature scheme has collapsed onto a few documents:
# ESS = (Σw)²/Σw², reported per source with the weight concentration
# ratio ESS/n).  Weights here are the repo's mixture-temperature form
# (per-source share^(1/T − 1), T = 0.7, broadcast from a counts
# rollup); all sums are exact decimals over 6-decimal-rounded
# weights, the ratios single double expressions.  One scan + one
# keyed agg — the diagnostic costs nothing next to the pipeline it
# audits.
QESS_ORACLE = """
WITH cnt AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nt
  FROM documents GROUP BY source
), w AS (
  SELECT source, n,
         CAST(ROUND(POWER(CAST(n AS DOUBLE) / nt, 1.0 / 0.7 - 1.0), 6)
              AS DECIMAL(7,6)) AS wgt
  FROM cnt
), s AS (
  SELECT w.source, w.n, w.wgt,
         CAST(SUM(CAST(w.n AS DECIMAL(13,0)) * w.wgt) OVER () AS DOUBLE) AS sw,
         CAST(SUM(CAST(w.n AS DECIMAL(13,0)) * w.wgt * w.wgt) OVER () AS DOUBLE)
           AS sww
  FROM w
)
SELECT source, n,
       CAST(wgt AS DOUBLE) AS weight,
       ROUND(sw * sw / sww, 6) AS ess,
       ROUND(sw * sw / sww / (SELECT SUM(n) FROM cnt), 6) AS ess_ratio
FROM s
ORDER BY source
"""


@declare(
    "q_effective_sample_size",
    oracle=QESS_ORACLE,
    description="effective sample size (Σw)²/Σw² of temperature-reweighted source weights — the collapse diagnostic for mixture reweighting, decimal-exact sums (reweighting [ext])",
)
def q_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tot = Window.partitionBy()
    cnt = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("nt", F.sum("n").over(tot).cast("long"))
    )
    # wgt = share^(1/T − 1) ≤ 1, so decimal(7,6) holds it exactly and
    # the n·w / n·w² products stay inside 38 digits — Spark's decimal
    # multiply silently reduces scale past precision 38, which is an
    # engine-specific rounding (the very thing the decimal lane exists
    # to avoid)
    w = cnt.withColumn(
        "wgt",
        F.round(
            F.pow(F.col("n").cast("double") / F.col("nt"), 1.0 / 0.7 - 1.0), 6
        ).cast("decimal(7,6)"),
    )
    s = w.select(
        "source",
        "n",
        "wgt",
        F.sum(F.col("n").cast("decimal(13,0)") * F.col("wgt"))
        .over(tot)
        .cast("double")
        .alias("sw"),
        F.sum(F.col("n").cast("decimal(13,0)") * F.col("wgt") * F.col("wgt"))
        .over(tot)
        .cast("double")
        .alias("sww"),
        F.sum("n").over(tot).cast("double").alias("ntot"),
    )
    ess = F.col("sw") * F.col("sw") / F.col("sww")
    return s.select(
        "source",
        "n",
        F.col("wgt").cast("double").alias("weight"),
        F.round(ess, 6).alias("ess"),
        F.round(ess / F.col("ntot"), 6).alias("ess_ratio"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Split-conformal prediction quantile ([ext] uncertainty
# quantification): per priority, the symmetric 90% conformal interval
# around the group median — q̂ = the ⌈(n+1)·0.9⌉-th smallest
# |v − median| score, the finite-sample-valid band split conformal
# prediction hands any point predictor.  Median and score thresholds
# come from the distinct-value ECDF in exact decimal/integer
# arithmetic (the weighted-median machinery, twice); no value-level
# sort of the fact table, only windows over distinct values.
QCONF_ORACLE = """
WITH d AS (
  SELECT o_orderpriority AS pr, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
), e AS (
  SELECT pr, v, c,
         SUM(c) OVER (PARTITION BY pr ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(c) OVER (PARTITION BY pr) AS n
  FROM d
), med AS (
  SELECT pr, MIN(CASE WHEN cum * 2 >= n THEN v END) AS m,
         CAST(MAX(n) AS BIGINT) AS n
  FROM e GROUP BY pr
), scores AS (
  SELECT d.pr, abs(d.v - md.m) AS s, d.c, md.n, md.m
  FROM d JOIN med md ON md.pr = d.pr
), sc AS (
  SELECT pr, s, n, m,
         SUM(c) OVER (PARTITION BY pr ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM (SELECT pr, s, SUM(c) AS c, MAX(n) AS n, MAX(m) AS m
        FROM scores GROUP BY pr, s)
)
SELECT pr,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MAX(m) AS DOUBLE) AS median,
       CAST(MIN(CASE WHEN cum * 10 >= (n + 1) * 9 THEN s END) AS DOUBLE) AS qhat,
       CAST(MAX(m) - MIN(CASE WHEN cum * 10 >= (n + 1) * 9 THEN s END) AS DOUBLE)
         AS lo,
       CAST(MAX(m) + MIN(CASE WHEN cum * 10 >= (n + 1) * 9 THEN s END) AS DOUBLE)
         AS hi
FROM sc
GROUP BY pr
ORDER BY pr
"""


@declare(
    "q_conformal_quantile",
    oracle=QCONF_ORACLE,
    description="split-conformal 90% interval per priority: the ceil((n+1)*0.9)-th smallest |v − median| via distinct-value ECDFs, integer-exact rank thresholds (UQ [ext])",
)
def q_conformal_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    d = o.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    # explicit pr-keyed exchange for the two CPU-dense distinct-value
    # ECDF window passes (r12, the exact-ECDF-lane treatment — AQE
    # otherwise coalesces the byte-small agg output onto 1-2 tasks)
    from jibaro_spark.operators.util import dense_exchange

    d = dense_exchange(d, "pr")
    cum_w = (
        Window.partitionBy("pr")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pr_w = Window.partitionBy("pr")
    e = d.select(
        "pr", "v", "c",
        F.sum("c").over(cum_w).alias("cum"),
        F.sum("c").over(pr_w).alias("n"),
    )
    med = e.groupBy("pr").agg(
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("v"))).alias("m"),
        F.max("n").cast("long").alias("n"),
    )
    scores = (
        d.join(med, "pr")
        .groupBy("pr", F.abs(F.col("v") - F.col("m")).alias("s"))
        .agg(F.sum("c").alias("c"), F.max("n").alias("n"), F.max("m").alias("m"))
    )
    scum_w = (
        Window.partitionBy("pr")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sc = dense_exchange(scores, "pr").select(
        "pr", "s", "n", "m", F.sum("c").over(scum_w).alias("cum")
    )
    qhat = F.min(
        F.when(F.col("cum") * 10 >= (F.col("n") + 1) * 9, F.col("s"))
    )
    return (
        sc.groupBy("pr")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("m").cast("double").alias("median"),
            qhat.cast("double").alias("qhat"),
            (F.max("m") - qhat).cast("double").alias("lo"),
            (F.max("m") + qhat).cast("double").alias("hi"),
        )
        .orderBy("pr")
    )
