"""Round-39 declared queries — closing the rows-only sketch wing
(VERDICT r9 #3): verifiable md5 twins for the two engine-specific
sketch queries that still lacked one.

* ``q_approx_quantiles_md5`` — the ``approx_percentile`` twin
  (production query ``q_approx_quantiles``): a mergeable bottom-k
  PRIORITY-SAMPLE quantile summary.  The sketch is the 512 rows with
  the smallest ``md5(o_orderkey)`` priorities — bottom-k is
  associative, so per-partition (or per-day) samples merge exactly by
  union + re-truncate, the same law as the KMV distinct sketch — and
  quantiles are read off the sample's integer ECDF.  The exact
  full-table ECDF quantiles ride along with per-percentile absolute
  error, so the driver hash-checks the ESTIMATOR, not just plumbing.
  Reference behavior: approximate quantiles with mergeable summaries
  (jibaro exposes engine approx aggs; this is the portable,
  cross-engine-verifiable construction).
* ``q_hll_mergeable_distinct_md5`` — the Datasketches-HLL-rollup twin
  (production query ``q_hll_mergeable_distinct``) at the PRODUCTION
  design point the raw-estimator twin (``q_hll_union_md5``: m=256,
  per order status, raw estimator only) never exercises: m=1024
  registers WITH the small-range linear-counting correction branch
  (E ≤ 2.5m and V > 0 → m·ln(m/V)) that real HLL implementations take
  at low register fill — which is exactly the regime of the fixtures,
  so the branch is actually executed — grouped per order priority,
  plus the union-by-register-MAX merged estimate (the rollup law).

Cross-engine conventions follow ``queries/registry.py``: md5-derived
integers via ``conv``/hex-literal casts, integer-exact ECDF ranks and
register sums (DECIMAL accumulation), doubles only at the output
boundary, ``ROUND(…, 6)`` on every log/division output, identical
aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Mergeable priority-sample quantile sketch (md5 mode).

_QS_K = 512
# ceil(p * 512) for p in (0.25, 0.50, 0.75, 0.95)
_QS_RANKS = {"p25": 128, "p50": 256, "p75": 384, "p95": 487}
# ceil(p * n) as exact integer arithmetic: (num*n + den - 1) DIV den
_QS_FRACS = {"p25": (1, 4), "p50": (1, 2), "p75": (3, 4), "p95": (19, 20)}

QAQMD5_ORACLE = f"""
WITH fen AS (
  -- NULL/finite contract: a NULL key has no md5 priority, and a
  -- NULL/NaN/Inf price cannot sit on an ECDF axis (float fuzz sweep)
  SELECT o_orderkey AS k, o_totalprice AS price,
         md5(CAST(o_orderkey AS VARCHAR)) AS h
  FROM orders
  WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL
    AND isfinite(o_totalprice)
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM fen
), samp AS (
  SELECT price FROM fen ORDER BY h, k LIMIT {_QS_K}
), secdf AS (
  SELECT price, SUM(cnt) OVER (ORDER BY price) AS cum
  FROM (SELECT price, COUNT(*) AS cnt FROM samp GROUP BY price)
), est AS (
  SELECT
    MIN(CASE WHEN cum >= {_QS_RANKS['p25']} THEN price END) AS p25_est,
    MIN(CASE WHEN cum >= {_QS_RANKS['p50']} THEN price END) AS p50_est,
    MIN(CASE WHEN cum >= {_QS_RANKS['p75']} THEN price END) AS p75_est,
    MIN(CASE WHEN cum >= {_QS_RANKS['p95']} THEN price END) AS p95_est
  FROM secdf
), fecdf AS (
  SELECT price, SUM(cnt) OVER (ORDER BY price) AS cum
  FROM (SELECT price, COUNT(*) AS cnt FROM fen GROUP BY price)
), ex AS (
  SELECT
    MIN(CASE WHEN cum >= (1 * n.n_rows + 3) // 4 THEN price END) AS p25_exact,
    MIN(CASE WHEN cum >= (1 * n.n_rows + 1) // 2 THEN price END) AS p50_exact,
    MIN(CASE WHEN cum >= (3 * n.n_rows + 3) // 4 THEN price END) AS p75_exact,
    MIN(CASE WHEN cum >= (19 * n.n_rows + 19) // 20 THEN price END) AS p95_exact
  FROM fecdf, n
)
SELECT n.n_rows, CAST({_QS_K} AS BIGINT) AS n_sample,
       est.p25_est, est.p50_est, est.p75_est, est.p95_est,
       ex.p25_exact, ex.p50_exact, ex.p75_exact, ex.p95_exact,
       ROUND(ABS(est.p25_est - ex.p25_exact), 6) AS p25_err,
       ROUND(ABS(est.p50_est - ex.p50_exact), 6) AS p50_err,
       ROUND(ABS(est.p75_est - ex.p75_exact), 6) AS p75_err,
       ROUND(ABS(est.p95_est - ex.p95_exact), 6) AS p95_err
FROM est, ex, n
"""


@declare(
    "q_approx_quantiles_md5",
    oracle=QAQMD5_ORACLE,
    description="md5-mode quantile sketch: mergeable bottom-512 priority sample (associative bottom-k, partition samples union+re-truncate), quantiles off the sample's integer ECDF vs exact ECDF + abs error — the verifiable twin of q_approx_quantiles (sketches [ext])",
)
def q_approx_quantiles_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    inf = float("inf")
    # NULL/finite contract mirrored in the oracle (see QAQMD5_ORACLE)
    fen = orders.filter(
        F.col("o_orderkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & ~F.isnan("o_totalprice")
        & (F.abs("o_totalprice") < inf)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.md5(F.col("o_orderkey").cast("string")).alias("h"),
    )
    n1 = fen.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    # bottom-k by md5 priority: global TakeOrdered, never a full sort —
    # and the merge law at 100 TB is free (bottom-k of per-partition
    # bottom-k unions IS the global bottom-k)
    samp = fen.orderBy("h", "k").limit(_QS_K).select("price")

    def ecdf(df: DataFrame) -> DataFrame:
        # counts-first collapse: the cumulative window runs over the
        # value-domain-bounded distinct-price table, never row volume
        counts = df.groupBy("price").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, 0)
        return counts.withColumn("cum", F.sum("cnt").over(w))

    est = ecdf(samp).agg(
        *[
            F.min(F.when(F.col("cum") >= r, F.col("price"))).alias(f"{p}_est")
            for p, r in _QS_RANKS.items()
        ]
    )
    ex = (
        ecdf(fen.select("price"))
        .crossJoin(F.broadcast(n1))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum")
                        >= F.expr(
                            f"CAST(({num} * n_rows + {den} - 1) DIV {den} AS BIGINT)"
                        ),
                        F.col("price"),
                    )
                ).alias(f"{p}_exact")
                for p, (num, den) in _QS_FRACS.items()
            ]
        )
    )
    return (
        est.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(n1))
        .select(
            "n_rows",
            F.lit(_QS_K).cast("long").alias("n_sample"),
            *[f"{p}_est" for p in _QS_RANKS],
            *[f"{p}_exact" for p in _QS_RANKS],
            *[
                F.round(F.abs(F.col(f"{p}_est") - F.col(f"{p}_exact")), 6).alias(
                    f"{p}_err"
                )
                for p in _QS_RANKS
            ],
        )
    )


# ---------------------------------------------------------------------------
# md5-mode HyperLogLog at the production design point: m=1024 with the
# small-range linear-counting correction.  Bucket = first 3 hex digits
# of md5(key) mod 1024; rho = leading-zero count of the NEXT 13 hex
# digits (52-bit word) + 1 via exact string/integer ops (no float
# log2); Z accumulates as the exact integer Σ 2^(53 − M_j) in DECIMAL
# (≤ 1024·2^53 = 2^63, which overflows BIGINT by exactly one — hence
# decimal).  The correction branch E ≤ 2.5m ∧ V>0 → m·ln(m/V) is the
# estimator real HLL implementations serve at low fill — the fixtures'
# regime (≈130–1300 distinct keys per priority vs m=1024), so BOTH
# engines execute the branch, not just declare it.
_HLL2_M = 1024
_HLL2_RHO_SQL = """
CASE WHEN stripped = '' THEN 53
     ELSE 4 * (13 - LENGTH(stripped))
          + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
                 WHEN substr(stripped, 1, 1) IN ('2','3') THEN 2
                 WHEN substr(stripped, 1, 1) IN ('4','5','6','7') THEN 1
                 ELSE 0 END
          + 1 END
"""
# alpha_1024 * m * m, written as the same literal expression both sides
_HLL2_ALPHA_MM = "(0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024"
# corrected estimate from (zint, n_regs): raw = alpha*m^2 / (zint/2^53);
# V = m - n_regs; linear counting when raw <= 2.5m and V > 0
_HLL2_EST_SQL = f"""
ROUND(CASE WHEN ({_HLL2_ALPHA_MM}
                 / (CAST(zint AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 53 AS DOUBLE)))
                <= 2.5 * 1024
            AND {_HLL2_M} - n_regs > 0
       THEN 1024.0 * ln(1024.0 / CAST({_HLL2_M} - n_regs AS DOUBLE))
       ELSE {_HLL2_ALPHA_MM}
            / (CAST(zint AS DOUBLE) / CAST(CAST(1 AS BIGINT) << 53 AS DOUBLE))
       END, 6)
"""

QHLL2_ORACLE = f"""
WITH h AS (
  -- NULL contract: a NULL key has no hash; a NULL priority is a valid
  -- group on both engines (hash compare is row-sorted)
  SELECT o_orderpriority AS grp, md5(CAST(o_custkey AS VARCHAR)) AS hx
  FROM orders WHERE o_custkey IS NOT NULL
), parts AS (
  SELECT grp,
         CAST(('0x' || substr(hx, 1, 3)) AS BIGINT) % {_HLL2_M} AS bucket,
         regexp_replace(substr(hx, 4, 13), '^0+', '') AS stripped
  FROM h
), regs AS (
  SELECT grp, bucket, CAST(MAX({_HLL2_RHO_SQL}) AS BIGINT) AS m
  FROM parts GROUP BY 1, 2
), zsum AS (
  SELECT grp,
         CAST(SUM(CAST(CAST(1 AS BIGINT) << CAST(53 - m AS INTEGER) AS DECIMAL(38,0)))
              + ({_HLL2_M} - COUNT(*)) * CAST(CAST(1 AS BIGINT) << 53 AS DECIMAL(38,0))
              AS DECIMAL(38,0)) AS zint,
         CAST(COUNT(*) AS BIGINT) AS n_regs
  FROM regs GROUP BY grp
), uregs AS (
  SELECT bucket, MAX(m) AS m FROM regs GROUP BY bucket
), uz AS (
  SELECT CAST(SUM(CAST(CAST(1 AS BIGINT) << CAST(53 - m AS INTEGER) AS DECIMAL(38,0)))
              + ({_HLL2_M} - COUNT(*)) * CAST(CAST(1 AS BIGINT) << 53 AS DECIMAL(38,0))
              AS DECIMAL(38,0)) AS zint,
         CAST(COUNT(*) AS BIGINT) AS n_regs
  FROM uregs
), ex AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_custs
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
)
SELECT z.grp, z.n_regs, {_HLL2_EST_SQL.replace('zint', 'z.zint').replace('n_regs', 'z.n_regs')} AS hll_estimate,
       e.exact_custs,
       (SELECT {_HLL2_EST_SQL.replace('zint', 'uz.zint').replace('n_regs', 'uz.n_regs')} FROM uz) AS union_estimate
FROM zsum z JOIN ex e ON e.grp IS NOT DISTINCT FROM z.grp
ORDER BY z.grp
"""


@declare(
    "q_hll_mergeable_distinct_md5",
    oracle=QHLL2_ORACLE,
    description="md5-mode HLL at the production design point (m=1024 + small-range linear-counting correction, branch actually taken) per order priority + union-by-register-max rollup — the verifiable twin of q_hll_mergeable_distinct (sketches [ext])",
)
def q_hll_mergeable_distinct_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract mirrored in the oracle
    o = o.filter(F.col("o_custkey").isNotNull())
    hx = F.md5(F.col("o_custkey").cast("string"))
    parts = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.pmod(
            F.conv(F.substring(hx, 1, 3), 16, 10).cast("long"), F.lit(_HLL2_M)
        ).alias("bucket"),
        F.regexp_replace(F.substring(hx, 4, 13), "^0+", "").alias("stripped"),
    )
    first = F.substring("stripped", 1, 1)
    rho = F.when(F.col("stripped") == "", 53).otherwise(
        4 * (13 - F.length("stripped"))
        + F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + 1
    )
    regs = parts.withColumn("rho", rho).groupBy("grp", "bucket").agg(
        F.max("rho").cast("long").alias("m")
    )
    term = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))").cast(
        "decimal(38,0)"
    )
    full = F.shiftleft(F.lit(1).cast("long"), 53).cast("decimal(38,0)")

    def zsum(df: DataFrame, keys: "list[str]") -> DataFrame:
        return df.groupBy(*keys).agg(
            (F.sum(term) + (_HLL2_M - F.count(F.lit(1))) * full)
            .cast("decimal(38,0)")
            .alias("zint"),
            F.count(F.lit(1)).cast("long").alias("n_regs"),
        )

    alpha_mm = F.lit(0.7213 / (1 + 1.079 / 1024)) * 1024 * 1024
    two53 = F.shiftleft(F.lit(1).cast("long"), 53).cast("double")
    raw = alpha_mm / (F.col("zint").cast("double") / two53)
    v = F.lit(_HLL2_M) - F.col("n_regs")
    corrected = F.round(
        F.when(
            (raw <= F.lit(2.5 * 1024)) & (v > 0),
            F.lit(1024.0) * F.log(F.lit(1024.0) / v.cast("double")),
        ).otherwise(raw),
        6,
    )
    per_grp = zsum(regs, ["grp"])
    # union law: per-bucket MAX across groups IS the union sketch
    uregs = regs.groupBy("bucket").agg(F.max("m").alias("m"))
    uz = zsum(uregs, []).select(corrected.alias("union_estimate"))
    ex = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count_distinct("o_custkey").cast("long").alias("exact_custs")
    )
    return (
        per_grp.withColumn("hll_estimate", corrected)
        .join(ex, per_grp["grp"].eqNullSafe(ex["grp"]))
        .drop(ex["grp"])
        .crossJoin(F.broadcast(uz))
        .select("grp", "n_regs", "hll_estimate", "exact_custs", "union_estimate")
        .orderBy("grp")
    )
