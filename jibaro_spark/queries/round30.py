"""Round-30 declared queries — mark-recapture estimation, price index
numbers, and term burstiness.

* ``q_capture_recapture`` — Lincoln-Petersen (with the Chapman
  bias correction) population estimate from two independent md5
  "capture" samples of the active-customer universe; the estimate is
  checked against the true universe size it tries to recover.
* ``q_laspeyres_paasche`` — classic index numbers between the first
  and last order years: Laspeyres (base-weighted), Paasche
  (current-weighted), and Fisher ideal, from exact decimal
  price/quantity aggregates per part matched across both periods.
* ``q_term_burstiness`` — Church-Gale burstiness of the top terms:
  observed document frequency vs the Poisson expectation
  n_docs·(1 − e^(−tf/n_docs)); bursty terms (df far below the
  Poisson line) concentrate in few documents — the contagion
  diagnostic behind df-based vs tf-based weighting choices.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QCAP_ORACLE = """
WITH universe AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), marked AS (
  SELECT k, CAST(('0x' || substr(md5('a|' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
              % 10 < 3 AS in_a,
         CAST(('0x' || substr(md5('b|' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
              % 10 < 3 AS in_b
  FROM universe
), cnt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(SUM(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
         CAST(SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT) AS nab
  FROM marked
)
SELECT n_true, na, nb, nab,
       ROUND((CAST(na AS DOUBLE) + 1) * (nb + 1) / (nab + 1) - 1, 6)
         AS chapman_estimate,
       ROUND(((CAST(na AS DOUBLE) + 1) * (nb + 1) / (nab + 1) - 1) / n_true, 6)
         AS estimate_ratio
FROM cnt
"""


@declare(
    "q_capture_recapture",
    oracle=QCAP_ORACLE,
    description="Lincoln-Petersen/Chapman capture-recapture estimate of the active-customer universe from two independent md5 capture samples, checked against the true size (population estimation [ext])",
)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    uni = orders.select(F.col("o_custkey").alias("k")).distinct()

    def md5_mark(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}|"), F.col("k").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10
            < 3
        )

    marked = uni.select(md5_mark("a").alias("in_a"), md5_mark("b").alias("in_b"))
    cnt = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum(F.col("in_a").cast("int")).cast("long").alias("na"),
        F.sum(F.col("in_b").cast("int")).cast("long").alias("nb"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("int")).cast("long").alias("nab"),
    )
    chapman = (F.col("na").cast("double") + 1) * (F.col("nb") + 1) / (
        F.col("nab") + 1
    ) - 1
    return cnt.select(
        "n_true",
        "na",
        "nb",
        "nab",
        F.round(chapman, 6).alias("chapman_estimate"),
        F.round(chapman / F.col("n_true"), 6).alias("estimate_ratio"),
    )


QIDX_ORACLE = """
WITH yr AS (
  SELECT MIN(year(o_orderdate)) AS y0, MAX(year(o_orderdate)) AS y1 FROM orders
), pp AS (
  SELECT l.l_partkey AS pk, year(o.o_orderdate) AS y,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS q,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS v
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  CROSS JOIN yr
  WHERE year(o.o_orderdate) IN (yr.y0, yr.y1)
  GROUP BY 1, 2
), px AS (
  SELECT pk, y, q, CAST(v AS DOUBLE) / CAST(q AS DOUBLE) AS p FROM pp
), matched AS (
  SELECT a.pk, a.q AS q0, a.p AS p0, b.q AS q1, b.p AS p1
  FROM px a JOIN px b ON b.pk = a.pk
  CROSS JOIN yr
  WHERE a.y = yr.y0 AND b.y = yr.y1
), sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CAST(ROUND(p1 * CAST(q0 AS DOUBLE), 4) AS DECIMAL(28,6)))
              AS DOUBLE) AS s_p1q0,
         CAST(SUM(CAST(ROUND(p0 * CAST(q0 AS DOUBLE), 4) AS DECIMAL(28,6)))
              AS DOUBLE) AS s_p0q0,
         CAST(SUM(CAST(ROUND(p1 * CAST(q1 AS DOUBLE), 4) AS DECIMAL(28,6)))
              AS DOUBLE) AS s_p1q1,
         CAST(SUM(CAST(ROUND(p0 * CAST(q1 AS DOUBLE), 4) AS DECIMAL(28,6)))
              AS DOUBLE) AS s_p0q1
  FROM matched
)
SELECT n_parts,
       ROUND(s_p1q0 / s_p0q0, 6) AS laspeyres,
       ROUND(s_p1q1 / s_p0q1, 6) AS paasche,
       ROUND(sqrt((s_p1q0 / s_p0q0) * (s_p1q1 / s_p0q1)), 6) AS fisher
FROM sums
"""


@declare(
    "q_laspeyres_paasche",
    oracle=QIDX_ORACLE,
    description="Laspeyres / Paasche / Fisher price indices between the first and last order years over parts traded in both periods — exact decimal value/quantity aggregates, rounded-addend revaluation sums (index numbers [ext])",
)
def q_laspeyres_paasche(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    yr = o.agg(
        F.min(F.year("o_orderdate")).alias("y0"),
        F.max(F.year("o_orderdate")).alias("y1"),
    )
    pp = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .crossJoin(F.broadcast(yr))
        .filter(
            (F.year("o_orderdate") == F.col("y0"))
            | (F.year("o_orderdate") == F.col("y1"))
        )
        .groupBy(
            F.col("l_partkey").alias("pk"), F.year("o_orderdate").alias("y")
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("v"),
        )
    )
    px = pp.select(
        "pk", "y", "q", (F.col("v").cast("double") / F.col("q").cast("double")).alias("p")
    )
    px = px.localCheckpoint(eager=True)  # both period sides share it
    b = px.select(
        F.col("pk").alias("bpk"),
        F.col("y").alias("by"),
        F.col("q").alias("q1"),
        F.col("p").alias("p1"),
    )
    matched = (
        px.crossJoin(F.broadcast(yr))
        .filter(F.col("y") == F.col("y0"))
        .join(b, F.col("bpk") == F.col("pk"))
        .filter(F.col("by") == F.col("y1"))
        .select(
            "pk",
            F.col("q").alias("q0"),
            F.col("p").alias("p0"),
            "q1",
            "p1",
        )
    )

    def rsum(expr, alias):
        return (
            F.sum(F.round(expr, 4).cast("decimal(28,6)"))
            .cast("double")
            .alias(alias)
        )

    sums = matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        rsum(F.col("p1") * F.col("q0").cast("double"), "s_p1q0"),
        rsum(F.col("p0") * F.col("q0").cast("double"), "s_p0q0"),
        rsum(F.col("p1") * F.col("q1").cast("double"), "s_p1q1"),
        rsum(F.col("p0") * F.col("q1").cast("double"), "s_p0q1"),
    )
    return sums.select(
        "n_parts",
        F.round(F.col("s_p1q0") / F.col("s_p0q0"), 6).alias("laspeyres"),
        F.round(F.col("s_p1q1") / F.col("s_p0q1"), 6).alias("paasche"),
        F.round(
            F.sqrt(
                (F.col("s_p1q0") / F.col("s_p0q0"))
                * (F.col("s_p1q1") / F.col("s_p0q1"))
            ),
            6,
        ).alias("fisher"),
    )


QBURST_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                ' ')) AS term
  FROM documents
), nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks),
tf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term
), top AS (
  SELECT term, tf, df FROM tf ORDER BY tf DESC, term LIMIT 20
)
SELECT t.term, t.tf, t.df,
       ROUND(nd.n_docs * (1 - ROUND(exp(-CAST(t.tf AS DOUBLE) / nd.n_docs), 10)),
             6) AS poisson_df,
       ROUND(CAST(t.df AS DOUBLE)
             / (nd.n_docs * (1 - ROUND(exp(-CAST(t.tf AS DOUBLE) / nd.n_docs), 10))),
             6) AS burstiness
FROM top t CROSS JOIN nd
ORDER BY t.tf DESC, t.term
"""


@declare(
    "q_term_burstiness",
    oracle=QBURST_ORACLE,
    description="Church-Gale burstiness of the top-20 terms: observed document frequency vs the Poisson expectation n_docs·(1−e^(−tf/n_docs)) — the contagion diagnostic behind df- vs tf-weighting (corpus stats [ext])",
)
def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    toks = toks.localCheckpoint(eager=True)  # n_docs + tf share it
    nd = toks.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    tf = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.countDistinct("doc_id").cast("long").alias("df"),
    )
    top = tf.orderBy(F.col("tf").desc(), "term").limit(20)
    pdf = F.col("n_docs") * (
        1 - F.round(F.exp(-F.col("tf").cast("double") / F.col("n_docs")), 10)
    )
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            "term",
            "tf",
            "df",
            F.round(pdf, 6).alias("poisson_df"),
            F.round(F.col("df").cast("double") / pdf, 6).alias("burstiness"),
        )
        .orderBy(F.col("tf").desc(), "term")
    )
