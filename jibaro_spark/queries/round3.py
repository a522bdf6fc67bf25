"""Round-3 declared queries: corpus statistics (PMI collocations,
BM25 ranking, token entropy), graph analytics (triangle counting),
robust statistics (winsorized means, decimal-exact correlation /
regression), the full analytic-window palette, and product
quantization for ANN compression.

All follow the registry's cross-engine determinism rules
(``registry.py`` module docstring): transcendentals are applied to
bit-identical operands with an identical parenthesization in both
engines and rounded immediately; multi-term float sums are decimal-
accumulated; every ranking carries an explicit tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.operators import similarity as sim
from jibaro_spark.operators import textops as tx
from jibaro_spark.operators.graph import triangle_count
from jibaro_spark.operators.relational import exact_quantiles_bucketed
from jibaro_spark.queries.llm import _NORM, _TOKS, _zipgrams
from jibaro_spark.queries.registry import declare, load_tables


# ---------------------------------------------------------------------------
# PMI bigram collocations: pmi(x,y) = ln( p(xy) / (p(x)·p(y)) ) with
# p(xy) = c_xy/N_bigrams and p(x) = c_x/N_tokens, computed as ONE
# double expression with identical operand order in both engines and
# rounded to 6 dp (absorbs libm last-ulp differences in ln).  Unigram
# and bigram counts are exact integers — the only float op is the
# final ratio+log.  Shape at scale: two token-keyed shuffles (unigram
# + bigram counts) and a broadcast join of the (vocab-sized) unigram
# table onto the bigram table.
QPMI_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), uni AS (
  SELECT unnest(ts) AS term FROM d
), uc AS (
  SELECT term, COUNT(*) AS c FROM uni GROUP BY term
), nu AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n_uni FROM uc
), big AS (
  SELECT unnest(list_slice(ts, 1, len(ts) - 1)) AS t1,
         unnest(list_slice(ts, 2, len(ts))) AS t2
  FROM d
), bc AS (
  SELECT t1, t2, COUNT(*) AS c_xy FROM big GROUP BY t1, t2
), nb AS (
  SELECT CAST(SUM(c_xy) AS DOUBLE) AS n_big FROM bc
)
SELECT bc.t1, bc.t2, bc.c_xy,
       ROUND(LN(((CAST(bc.c_xy AS DOUBLE) * nu.n_uni) * nu.n_uni)
                / ((nb.n_big * CAST(u1.c AS DOUBLE)) * CAST(u2.c AS DOUBLE))), 6) AS pmi
FROM bc
JOIN uc u1 ON bc.t1 = u1.term
JOIN uc u2 ON bc.t2 = u2.term
CROSS JOIN nu CROSS JOIN nb
WHERE bc.c_xy >= 5
ORDER BY pmi DESC, bc.t1, bc.t2
LIMIT 50
"""


@declare(
    "q_pmi_bigrams",
    oracle=QPMI_ORACLE,
    description="top bigram collocations by pointwise mutual information (corpus stats [ext])",
)
def q_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select("doc_id", tx.tokens(F.col("text")).alias("ts"))
    uni = d.select(F.explode("ts").alias("term"))
    uc = uni.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    nu = uc.agg(F.sum("c").cast("double").alias("n_uni"))
    n1 = F.size("ts") - 1
    big = d.select(
        F.explode(
            F.arrays_zip(
                F.slice("ts", F.lit(1), n1).alias("t1"),
                F.slice("ts", F.lit(2), n1).alias("t2"),
            )
        ).alias("bg")
    ).select(F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
    bc = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c_xy"))
    nb = bc.agg(F.sum("c_xy").cast("double").alias("n_big"))
    u1 = uc.select(F.col("term").alias("t1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("term").alias("t2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            ((F.col("c_xy").cast("double") * F.col("n_uni")) * F.col("n_uni"))
            / (
                (F.col("n_big") * F.col("c1").cast("double"))
                * F.col("c2").cast("double")
            )
        ),
        6,
    )
    return (
        bc.filter(F.col("c_xy") >= 5)
        .join(F.broadcast(u1), "t1")
        .join(F.broadcast(u2), "t2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select("t1", "t2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "t1", "t2")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# BM25 ranking of the corpus against a fixed conjunctive term query.
# idf and the per-term saturation factor are single double expressions
# (identical shape both engines) rounded to 10 dp; per-doc scores sum
# the ≤3 per-term contributions as DECIMAL (order-independent).  The
# shape at scale: one token shuffle for tf, a 3-row broadcast of term
# stats, top-k via TakeOrdered — no corpus-wide sort.
_BM25_TERMS = ("table", "hash", "window")
_K1, _B = 1.2, 0.75

_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"

QBM25_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), dl AS (
  SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM d
), stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM dl
), tok AS (
  SELECT doc_id, unnest(ts) AS term FROM d
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok WHERE term IN {_TERMS_SQL} GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM tf GROUP BY term
), contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           LN(1.0 + (CAST(stats.n_docs - dfreq.dft AS DOUBLE) + 0.5)
                    / (CAST(dfreq.dft AS DOUBLE) + 0.5))
           * ((CAST(tf.tf AS DOUBLE) * ({_K1} + 1.0))
              / (CAST(tf.tf AS DOUBLE)
                 + ({_K1} * ((1.0 - {_B})
                             + ({_B} * (CAST(dl.dl AS DOUBLE) / stats.avgdl))))))
         , 10) AS DECIMAL(18,12)) AS c
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       ROUND(CAST(SUM(c) AS DOUBLE), 6) AS bm25
FROM contrib
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id
LIMIT 25
"""


@declare(
    "q_bm25_search",
    oracle=QBM25_ORACLE,
    description="BM25 document ranking for a fixed term query (text search [ext])",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select("doc_id", tx.tokens(F.col("text")).alias("ts"))
    dl = d.select("doc_id", F.size("ts").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    tok = d.select("doc_id", F.explode("ts").alias("term"))
    tf = (
        tok.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("dft"))
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("dft")).cast("double") + F.lit(0.5))
        / (F.col("dft").cast("double") + F.lit(0.5))
    )
    sat = (F.col("tf").cast("double") * F.lit(_K1 + 1.0)) / (
        F.col("tf").cast("double")
        + (
            F.lit(_K1)
            * (
                F.lit(1.0 - _B)
                + (F.lit(_B) * (F.col("dl").cast("double") / F.col("avgdl")))
            )
        )
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * sat, 10).cast("decimal(18,12)").alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
            F.round(F.sum("c").cast("double"), 6).alias("bm25"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Per-document Shannon entropy of the token distribution (a repetition
# /diversity quality signal: low entropy ⇒ template/spam-like text).
# Each type's -p·ln(p) is rounded to 10 dp and decimal-accumulated —
# the per-doc sum is order-independent and engine-exact.
QENT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tc AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY doc_id, term
), wn AS (
  SELECT doc_id, term, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM tc
), e AS (
  SELECT doc_id, n,
         CAST(ROUND(-((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                      * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 10)
              AS DECIMAL(18,12)) AS h
  FROM wn
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(MIN(n) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(h) AS DOUBLE), 6) AS entropy
FROM e
GROUP BY doc_id
ORDER BY doc_id
"""


@declare(
    "q_doc_entropy",
    oracle=QENT_ORACLE,
    description="per-doc token-distribution Shannon entropy — diversity quality signal (text analysis [ext])",
)
def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tok = docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("term"))
    tc = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wn = tc.withColumn("n", F.sum("c").over(Window.partitionBy("doc_id")))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    e = wn.select(
        "doc_id",
        "n",
        F.round(-(p * F.log(p)), 10).cast("decimal(18,12)").alias("h"),
    )
    return (
        e.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.min("n").cast("long").alias("n_tokens"),
            F.round(F.sum("h").cast("double"), 6).alias("entropy"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Triangle counting over the supplier co-supply graph (suppliers
# linked when both ship heavy lots of the same part).  The oracle is
# the same oriented 3-way join in SQL; the Spark operator is
# graph.triangle_count (Suri–Vassilvitskii node-iterator).
QTRI_ORACLE = """
WITH ps AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
  FROM lineitem WHERE l_quantity >= 45
), e AS (
  SELECT DISTINCT a.sk AS a, b.sk AS b
  FROM ps a JOIN ps b ON a.pk = b.pk AND a.sk < b.sk
), tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
), nodes AS (
  SELECT a AS node FROM e UNION SELECT b AS node FROM e
), cnt AS (
  SELECT node, COUNT(*) AS n FROM corners GROUP BY node
)
SELECT nodes.node AS supplier,
       CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_triangles
FROM nodes LEFT JOIN cnt USING (node)
ORDER BY n_triangles DESC, supplier
LIMIT 20
"""


@declare(
    "q_triangle_count",
    oracle=QTRI_ORACLE,
    description="per-node triangle counts on the supplier co-supply graph (graph analytics [ext])",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    ps = (
        li.filter(F.col("l_quantity") >= 45)
        .select(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    pairs = (
        ps.alias("x")
        .join(ps.alias("y"), "pk")
        .filter(F.col("x.sk") < F.col("y.sk"))
        .select(F.col("x.sk").alias("src"), F.col("y.sk").alias("dst"))
    )
    return (
        triangle_count(pairs)
        .select(F.col("node").alias("supplier"), "n_triangles")
        .orderBy(F.col("n_triangles").desc(), "supplier")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Winsorized robust statistics: clip prices to the exact [p05, p95]
# per-group quantiles (histogram-refinement operator — no full sort),
# then decimal-exact means.  Composition proves the quantile operator
# plugs into downstream relational work (the robust-stats pipeline
# every data-quality report runs).
QWINS_ORACLE = """
WITH q AS (
  SELECT l_returnflag,
         ROUND(quantile_cont(l_extendedprice, 0.05), 6) AS p05,
         ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN l.l_extendedprice < q.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
       CAST(SUM(CASE WHEN l.l_extendedprice > q.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
       ROUND(CAST(SUM(CAST(LEAST(GREATEST(l.l_extendedprice, q.p05), q.p95)
                           AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
FROM lineitem l JOIN q USING (l_returnflag)
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@declare(
    "q_winsorize_stats",
    oracle=QWINS_ORACLE,
    description="winsorized means via exact distributed quantiles + clip (robust stats [ext])",
)
def q_winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NOTE (r12): a q_percentile_prices-style input spread here
    # ABAB-measured WORSE (3.92 vs 3.25) — unlike that query, the
    # spread exchange would feed the quantile operator's separate
    # construction JOBS plus the clipped re-join's scan, and shuffle
    # output is not reused across jobs, so the 6M-row exchange re-runs
    # per pass.  The unspread pruned re-scan is the cheaper form.
    q = exact_quantiles_bucketed(
        li.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
        [(0.05, "p05"), (0.95, "p95")],
        materialize=False,
    ).select(
        "l_returnflag",
        F.round("p05", 6).alias("p05"),
        F.round("p95", 6).alias("p95"),
    )
    clipped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("p05")), F.col("p95")
    )
    return (
        li.join(F.broadcast(q), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("p05"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_clip_lo"),
            F.sum(
                F.when(F.col("l_extendedprice") > F.col("p95"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_clip_hi"),
            F.round(
                F.sum(clipped.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("winsorized_mean"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Analytic-window palette: percent_rank / cume_dist / first / last /
# nth_value over one window spec (unique ordering ⇒ deterministic;
# rank ratios are integer divisions in double — bit-identical in any
# engine).  last_value needs the full-partition frame explicitly; the
# default frame stops at CURRENT ROW in both engines.
QWINPAL_ORACLE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       first_value(c_acctbal) OVER w AS top_bal,
       last_value(c_acctbal)
         OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS bottom_bal,
       nth_value(c_acctbal, 3)
         OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_bal
FROM customer
WHERE c_acctbal IS NOT NULL AND c_custkey IS NOT NULL
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
"""


@declare(
    "q_window_palette",
    oracle=QWINPAL_ORACLE,
    description="percent_rank/cume_dist/first/last/nth_value analytic palette (W3 [ext])",
)
def q_window_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    # NULL contract (relational fuzz sweep): the window's ordering axis
    # must be defined — Spark and SQL sort NULLs to opposite ends
    cust = cust.filter(
        F.col("c_acctbal").isNotNull() & F.col("c_custkey").isNotNull()
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("c_acctbal").over(w).alias("top_bal"),
        F.last("c_acctbal").over(wfull).alias("bottom_bal"),
        F.nth_value("c_acctbal", 3).over(wfull).alias("third_bal"),
    ).orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")


# ---------------------------------------------------------------------------
# Correlation / covariance / least-squares slope from DECIMAL-EXACT
# moments.  Built-in corr()/covar() accumulate doubles in engine-
# specific order (never hash-stable cross-engine); sums of decimal-cast
# products are exact, and the closed-form combination is a single
# double expression with identical operand order.  The quantity and
# price·quantity products carry ≤ 4 fractional digits and fit a
# double's 53-bit mantissa exactly, so the cast loses nothing.
QCORR_ORACLE = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       ROUND(((n * sxy) - (sx * sy)) / (n * (n - 1.0)), 6) AS covar_samp,
       ROUND(((n * sxy) - (sx * sy))
             / (SQRT((n * sxx) - (sx * sx)) * SQRT((n * syy) - (sy * sy))), 6) AS corr,
       ROUND(((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx)), 6) AS slope,
       ROUND((sy - ((((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))) * sx)) / n, 6) AS intercept
FROM m
ORDER BY l_returnflag
"""


@declare(
    "q_corr_stats",
    oracle=QCORR_ORACLE,
    description="corr/covar/regression from decimal-exact moments — cross-engine-deterministic (A9 [ext])",
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # project + hash-spread before the 5-term decimal moment agg (r12,
    # the PCA moment-pass treatment — the map-side partials otherwise
    # run on the single-row-group scan's ONE core; decimal sums are
    # order-free exact, so placement cannot change a moment)
    from jibaro_spark.operators.util import ensure_parallelism

    li = ensure_parallelism(
        li.select("l_returnflag", "l_quantity", "l_extendedprice"),
        by="l_extendedprice",
    )
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x.cast("decimal(28,4)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(28,4)")).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((y * y).cast("decimal(28,4)")).cast("double").alias("syy"),
        F.sum((x * y).cast("decimal(28,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n"),
        F.round(((n * sxy) - (sx * sy)) / (n * (n - F.lit(1.0))), 6).alias(
            "covar_samp"
        ),
        F.round(
            ((n * sxy) - (sx * sy))
            / (
                F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))
            ),
            6,
        ).alias("corr"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - (slope * sx)) / n, 6).alias("intercept"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Product quantization: 64-dim vectors → 4 subspaces × 16 dims, codes
# from the 8 lowest-vec_id embeddings' slices (fully SQL-derivable
# codebook).  Per-vector output: the 4 code ids + decimal-exact total
# quantization error.  See similarity.pq_encode for the scale shape.
_PQ_M, _PQ_SUB, _PQ_K = 4, 16, 8

QPQ_ORACLE = f"""
WITH s AS (
  SELECT unnest(range(0, {_PQ_M})) AS sub
), c AS (
  SELECT s.sub, e.vec_id AS cid,
         list_slice(e.embedding, s.sub * {_PQ_SUB} + 1, s.sub * {_PQ_SUB} + {_PQ_SUB}) AS cvec
  FROM embeddings e CROSS JOIN s WHERE e.vec_id < {_PQ_K}
), sv AS (
  SELECT e.vec_id, s.sub,
         list_slice(e.embedding, s.sub * {_PQ_SUB} + 1, s.sub * {_PQ_SUB} + {_PQ_SUB}) AS svec
  FROM embeddings e CROSS JOIN s
), d AS (
  SELECT sv.vec_id, sv.sub, c.cid,
         ROUND(list_sum(list_transform(range(1, {_PQ_SUB} + 1),
               i -> (CAST(sv.svec[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                  * (CAST(sv.svec[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))), 6) AS d2
  FROM sv JOIN c USING (sub)
), a AS (
  SELECT vec_id, sub, cid, d2,
         row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cid) AS rn
  FROM d
)
SELECT vec_id,
       MAX(CASE WHEN sub = 0 THEN cid END) AS code0,
       MAX(CASE WHEN sub = 1 THEN cid END) AS code1,
       MAX(CASE WHEN sub = 2 THEN cid END) AS code2,
       MAX(CASE WHEN sub = 3 THEN cid END) AS code3,
       ROUND(CAST(SUM(CAST(d2 AS DECIMAL(18,6))) AS DOUBLE), 6) AS qerr
FROM a WHERE rn = 1
GROUP BY vec_id
ORDER BY vec_id
"""


@declare(
    "q_pq_encode",
    oracle=QPQ_ORACLE,
    description="product-quantization codes + reconstruction error (ANN compression [ext])",
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    codebook = (
        emb.filter(F.col("vec_id") < _PQ_K)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_PQ_M - 1))).alias("sub"),
            F.col("vec_id").alias("cid"),
            F.col("embedding"),
        )
        .select(
            "sub",
            "cid",
            F.slice(
                F.col("embedding"), F.col("sub") * _PQ_SUB + 1, _PQ_SUB
            ).alias("cvec"),
        )
    )
    codes = sim.pq_encode(
        emb, "vec_id", "embedding", codebook, m=_PQ_M, sub_dim=_PQ_SUB
    )
    aggs = [
        F.max(F.when(F.col("sub") == s, F.col("cid"))).alias(f"code{s}")
        for s in range(_PQ_M)
    ]
    return (
        codes.groupBy("vec_id")
        .agg(
            *aggs,
            F.round(
                F.sum(F.col("d2").cast("decimal(18,6)")).cast("double"), 6
            ).alias("qerr"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# Cross-document duplicated-shingle fraction: the corpus-level fuzzy-
# dedup signal (RefinedWeb/Dolma-style "what share of this doc's
# 8-gram shingles appear in some other doc").  Distinct (doc, shingle)
# → shingle occurrence counts → per-doc duplicated share.  Two
# shingle-keyed shuffles; the occurrence table joins back on the
# shingle key (no broadcast — shingle vocab grows with the corpus).
_XDUP_N = 8

QXDUP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents WHERE text IS NOT NULL
), sh AS (
  SELECT DISTINCT doc_id,
         unnest({_zipgrams('ts', _XDUP_N)}) AS s
  FROM d
), occ AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n_docs_with FROM sh GROUP BY s
)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN occ.n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN occ.n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM sh JOIN occ USING (s)
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


@declare(
    "q_crossdoc_shingle_dup",
    oracle=QXDUP_ORACLE,
    description="per-doc share of 8-gram shingles duplicated elsewhere in the corpus (fuzzy-dedup signal [ext])",
)
def q_crossdoc_shingle_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import shingles

    # NULL text shingles to nothing on either side (NULL-fuzz sweep)
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    # The interpreted shingle HOF is the dominant cost and (doc_id, s)
    # feeds both the occurrence count and the per-doc join — physical
    # plans otherwise run the Generate TWICE (once per consumer, the
    # occ side having been broadcast).  Materialize the extraction
    # once; measured 2.8 s → 1.9 s at sf0.1.
    sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles(F.col("text"), n=_XDUP_N))
        ).alias("s"),
    ).localCheckpoint(eager=True)
    occ = sh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("n_docs_with"))
    dup = F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0)).cast("long")
    return (
        sh.join(occ, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            dup.alias("n_dup"),
            (
                F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Collection-aggregate palette: collect_set / collect_list with
# explicit in-array ordering, rendered to strings (arrays are sorted
# before joining so the value is partition-order-invariant; string
# rendering sidesteps engine array formatting).
QCOLLECT_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
       array_to_string(list_slice(list(CAST(o_totalprice AS DECIMAL(18,2))
                                       ORDER BY o_totalprice DESC), 1, 3), ',') AS top3_totals
FROM orders
WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@declare(
    "q_collect_palette",
    oracle=QCOLLECT_ORACLE,
    description="collect_set/collect_list aggregates with deterministic in-array ordering (A9 [ext])",
)
def q_collect_palette(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    # NULL contract (relational fuzz sweep): Spark's collect_list/set
    # silently skip NULLs while SQL list() keeps them — collect only
    # defined values, declared on both sides
    orders = orders.filter(
        F.col("o_orderstatus").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    top3 = F.concat_ws(
        ",",
        F.transform(
            F.slice(
                F.sort_array(
                    F.collect_list(F.col("o_totalprice").cast("decimal(18,2)")),
                    asc=False,
                ),
                1,
                3,
            ),
            lambda x: x.cast("string"),
        ),
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.concat_ws(",", F.sort_array(F.collect_set("o_orderstatus"))).alias(
                "statuses"
            ),
            top3.alias("top3_totals"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# BPE merge-pair counting — the inner step of byte-pair-encoding
# tokenizer training: adjacent symbol-pair frequencies over the
# word-frequency dictionary (count words once, then weight each
# word's char pairs by its corpus frequency — the standard trick that
# makes BPE training corpus-size-independent after one pass).
QBPE_PAIRS_ORACLE = f"""
WITH words AS (
  SELECT unnest({_TOKS}) AS w FROM documents
), wf AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM words GROUP BY w
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, i, 2))) AS pair,
         freq
  FROM wf WHERE length(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair
LIMIT 30
"""


@declare(
    "q_bpe_merge_pairs",
    oracle=QBPE_PAIRS_ORACLE,
    description="adjacent char-pair frequencies over the word-frequency dict — the BPE training kernel (tokenizer [ext])",
)
def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    words = docs.select(F.explode(tx.tokens(F.col("text"))).alias("w"))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    # pair extraction via zip_with over two char-array slices: string
    # substr(i, 2) seeks code points from the string start (O(i) per
    # pair → O(len²) per word), and element_at(split(...), i) inside a
    # lambda re-evaluates the split per element — both were measured
    # wall cliffs on the bigval class's 100k-char unbroken tokens
    # (r11).  The slice form evaluates the split a bounded number of
    # times; the lambda touches only its O(1) element args.
    chars = F.split(F.col("w"), "")
    n1 = F.length("w") - 1
    pairs = (
        wf.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(chars, 1, n1),
                    F.slice(chars, 2, n1),
                    lambda a, b: F.concat(a, b),
                )
            ).alias("pair"),
            "freq",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Length-grouped batching: bucket docs by token-length band, number
# them deterministically inside each band, cut fixed-size batches, and
# report per-batch padding waste (the measure length-grouping exists
# to minimize).  One shuffle on the band key; the in-band window is
# bounded by band size.  At 100 TB the band window would be replaced
# by the distributed prefix-sum numbering (partitioned_prefix_sum) —
# the band shape stays identical.
_BATCH_SIZE = 32

QLENB_ORACLE = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
), banded AS (
  SELECT doc_id, n_tokens, CAST(n_tokens // 8 AS BIGINT) AS band FROM d
), numbered AS (
  SELECT band, n_tokens,
         CAST((row_number() OVER (PARTITION BY band ORDER BY n_tokens, doc_id) - 1)
              // {_BATCH_SIZE} AS BIGINT) AS batch_id
  FROM banded
)
SELECT band, batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_tokens) AS BIGINT) AS max_len,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_len,
       CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS padding_waste
FROM numbered
GROUP BY band, batch_id
ORDER BY band, batch_id
"""


@declare(
    "q_length_batching",
    oracle=QLENB_ORACLE,
    description="length-grouped batch assembly + padding-waste accounting (training pipeline [ext])",
)
def q_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        "doc_id", F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    banded = d.withColumn("band", (F.col("n_tokens") / 8).cast("long"))
    w = Window.partitionBy("band").orderBy("n_tokens", "doc_id")
    numbered = banded.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / _BATCH_SIZE).cast("long"),
    )
    return (
        numbered.groupBy("band", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("max_len"),
            F.sum("n_tokens").cast("long").alias("sum_len"),
            (F.count(F.lit(1)) * F.max("n_tokens") - F.sum("n_tokens"))
            .cast("long")
            .alias("padding_waste"),
        )
        .orderBy("band", "batch_id")
    )


@declare(
    "q_knn_ivfpq",
    oracle=None,
    description="IVF-PQ approximate kNN: coarse cells + PQ/ADC scoring + exact re-rank (J6 100 TB path; recall pinned in tests)",
)
def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.util import ensure_parallelism

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # r12 (guide §2.5): every phase (Lloyd assignment, PQ training and
    # encode, the IVF cell map) runs an interpreted k×dim nearest-cell
    # expression per row, and all of them inherited the single-row-
    # group scan's ONE partition (12.5 s at sf0.1).  One deterministic
    # spread feeds them all.  The family's contract is recall-pinned
    # (test_approx_ops), robust to the ulp-level centroid-mean shifts
    # a different partial-aggregation grouping can produce.
    emb = ensure_parallelism(emb, by="vec_id").localCheckpoint(eager=False)
    # (lazy pin: the training phases are SEPARATE collect jobs — seed,
    #  Lloyd means, PQ codebook — and shuffle output is not reused
    #  across jobs, so without the pin each job re-ran scan+exchange)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = sim.seed_centroids(emb, "vec_id", "embedding", n_centroids=8)
    cents = sim.kmeans_refine(emb, "embedding", cents, iterations=1)
    codebook = sim.train_pq_codebook(
        emb, "vec_id", "embedding", m=_PQ_M, sub_dim=_PQ_SUB, k=16, iterations=1
    )
    return (
        sim.ivfpq_search(
            queries, emb, "q_id", "q_vec", "vec_id", "embedding",
            k=5, centroids=cents, pq_codebook=codebook,
            m=_PQ_M, sub_dim=_PQ_SUB, n_probe=3, rerank=64,
        )
        .select("q_id", "vec_id", "cosine_sim", "rank")
        .orderBy("q_id", "rank")
    )


# ---------------------------------------------------------------------------
# Token-budget curation cut: per source, admit documents in the
# deterministic md5 shuffle order until the source's token budget is
# exhausted (the "take N tokens per domain" mixture step every corpus
# build runs).  The in-group running total is a window bounded by
# group size; at 100 TB the same cut runs on the distributed prefix
# sum (partitioned_prefix_sum) with identical semantics.  A doc is
# admitted if the budget was not already exhausted BEFORE it (so the
# boundary doc that crosses the budget is included — matching greedy
# sequential packing).
_TOKEN_BUDGET = 3000

QBUDGET_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), r AS (
  SELECT doc_id, source, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tokens_before
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_admitted,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_admitted,
       CAST(MAX(tokens_before + n_tokens) AS BIGINT) AS high_water
FROM r
WHERE tokens_before < {_TOKEN_BUDGET}
GROUP BY source
ORDER BY source
"""


@declare(
    "q_token_budget_sample",
    oracle=QBUDGET_ORACLE,
    description="per-source token-budget admission in deterministic md5 order (curation mixture [ext])",
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        "doc_id",
        "source",
        F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = d.withColumn(
        "tokens_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long"),
    )
    return (
        r.filter(F.col("tokens_before") < _TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_admitted"),
            F.sum("n_tokens").cast("long").alias("tokens_admitted"),
            F.max(F.col("tokens_before") + F.col("n_tokens"))
            .cast("long")
            .alias("high_water"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Trailing-window z-score anomaly detection on the event stream: each
# event's value against the mean/std of its user's previous 10 events.
# Moments are decimal-accumulated over the window (order-independent);
# the z-score is one double expression rounded to 6 dp.  Sample-std
# denominator (n−1); windows with <3 trailing events emit NULL z.
QZSCORE_ORACLE = """
WITH w AS (
  SELECT event_id, user_id, ts, value,
         CAST(COUNT(value) OVER tw AS BIGINT) AS n_prev,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER tw AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(28,8))) OVER tw AS DOUBLE) AS s2
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  WINDOW tw AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, value,
       n_prev,
       CASE WHEN n_prev >= 3
                 AND ((CAST(n_prev AS DOUBLE) * s2) - (s1 * s1)) > 0.0
            THEN ROUND((value - (s1 / CAST(n_prev AS DOUBLE)))
                       / SQRT((((CAST(n_prev AS DOUBLE) * s2) - (s1 * s1))
                               / CAST(n_prev AS DOUBLE))
                              / (CAST(n_prev AS DOUBLE) - 1.0)), 6)
            ELSE NULL END AS zscore
FROM w
ORDER BY event_id
"""


@declare(
    "q_event_zscore",
    oracle=QZSCORE_ORACLE,
    description="trailing-window z-score anomaly signal per user (streaming-adjacent analytics [ext])",
)
def q_event_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeline fence: no ts/user → no position in the trailing window
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    tw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    v = F.col("value")
    d = ev.select(
        "event_id",
        "user_id",
        "value",
        F.count("value").over(tw).cast("long").alias("n_prev"),
        F.sum(v.cast("decimal(18,4)")).over(tw).cast("double").alias("s1"),
        F.sum((v * v).cast("decimal(28,8)")).over(tw).cast("double").alias("s2"),
    )
    n = F.col("n_prev").cast("double")
    s1, s2 = F.col("s1"), F.col("s2")
    var_num = (n * s2) - (s1 * s1)
    z = (v - (s1 / n)) / F.sqrt((var_num / n) / (n - F.lit(1.0)))
    return d.select(
        "event_id",
        "user_id",
        "value",
        "n_prev",
        F.when((F.col("n_prev") >= 3) & (var_num > 0.0), F.round(z, 6))
        .otherwise(F.lit(None))
        .alias("zscore"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Discrete exact quantiles (percentile_disc / median-of-record):
# the same histogram-refinement selection, rank ⌈n·p⌉, no
# interpolation — the returned value is an actual data point.
QPDISC_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_disc(l_extendedprice, 0.25), 6) AS p25_disc,
       ROUND(quantile_disc(l_extendedprice, 0.50), 6) AS p50_disc,
       ROUND(quantile_disc(l_extendedprice, 0.90), 6) AS p90_disc
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@declare(
    "q_percentile_disc",
    oracle=QPDISC_ORACLE,
    description="exact discrete quantiles (percentile_disc) via histogram-refinement selection (A9 [ext])",
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): quantiles of defined
    # values per defined group, declared identically in the oracle
    li = li.filter(
        F.col("l_returnflag").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    q = exact_quantiles_bucketed(
        li.select("l_returnflag", "l_extendedprice"),
        ["l_returnflag"],
        "l_extendedprice",
        [(0.25, "p25_disc"), (0.50, "p50_disc"), (0.90, "p90_disc")],
        materialize=False,
        discrete=True,
    )
    return q.select(
        "l_returnflag",
        F.round("p25_disc", 6).alias("p25_disc"),
        F.round("p50_disc", 6).alias("p50_disc"),
        F.round("p90_disc", 6).alias("p90_disc"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Weekly cohort retention: users bucketed by first-activity week, then
# distinct active users per (cohort, week offset) — the standard
# retention matrix.  Two user-keyed shuffles (first-event min + the
# cohort join) and one (cohort, offset) count-distinct; all
# monday-truncated weeks, identical in both engines.
QCOHORT_ORACLE = """
WITH first_ev AS (
  SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS week
  FROM events
)
SELECT f.cohort_week,
       CAST(DATE_DIFF('day', f.cohort_week, a.week) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
FROM activity a JOIN first_ev f USING (user_id)
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset
"""


@declare(
    "q_cohort_retention",
    oracle=QCOHORT_ORACLE,
    description="weekly cohort retention matrix (first-activity cohorts × week offsets) (analytics [ext])",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    # weeks stay TIMESTAMP on both sides: DATE columns round-trip to
    # pandas as date objects from Spark but datetime64 from DuckDB,
    # which breaks the driver's stringified value hash (same
    # convention as q_date_palette).
    first_ev = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        activity.join(first_ev, "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.col("week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Edit-distance similarity join over part names: same-brand blocking,
# length prefilter, native levenshtein verify (no UDF).  Grouped
# output (brand × distance × pair count) keeps the result stable while
# the join itself does the real filter-verify work.
QEDIT_ORACLE = """
SELECT a.p_brand AS brand,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM part a
JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
GROUP BY brand, dist
ORDER BY brand, dist
"""


@declare(
    "q_edit_distance_pairs",
    oracle=QEDIT_ORACLE,
    description="edit-distance string-similarity join (blocked filter-verify, native levenshtein) (J5 [ext])",
)
def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import edit_distance_join

    part = load_tables(spark, sf_dir, "part")["part"]
    a = part.select(
        F.col("p_partkey").alias("key_a"), "p_name", "p_brand"
    )
    b = part.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("p_name_b"),
        F.col("p_brand").alias("p_brand_b"),
    )
    pairs = edit_distance_join(
        a, b, "key_a", "key_b", "p_name", "p_name_b",
        max_dist=2, block_on=("p_brand", "p_brand_b"),
    ).filter(F.col("key_a") < F.col("key_b"))
    return (
        pairs.groupBy(F.col("block").alias("brand"), F.col("dist").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("brand", "dist")
    )


# ---------------------------------------------------------------------------
# Gap-fill / carry-forward: sparse per-user measurements (only
# 'purchase' events carry a value here) forward-filled with
# last-non-null over the user's ordered history — the standard
# sensor/feature gap-fill.  No arithmetic: values pass through, so
# determinism is free.
QFFILL_ORACLE = """
SELECT event_id, user_id,
       CASE WHEN event_type = 'purchase' THEN value ELSE NULL END AS sparse_value,
       last_value(CASE WHEN event_type = 'purchase' THEN value ELSE NULL END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
FROM events
WHERE ts IS NOT NULL AND user_id IS NOT NULL
ORDER BY event_id
"""


@declare(
    "q_fill_forward",
    oracle=QFFILL_ORACLE,
    description="last-non-null forward fill over per-user ordered history (W3 [ext])",
)
def q_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeline fence: carry-forward is ts-ordered per user
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        sparse.alias("sparse_value"),
        F.last(sparse, ignorenulls=True).over(w).alias("filled_value"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Equi-width histogram via width_bucket: fixed [lo, hi) bounds, n+2
# overflow buckets — the profiling/binning primitive (Spark's builtin;
# the oracle replicates its floor arithmetic exactly, clamped to the
# same overflow buckets).
_HB_LO, _HB_HI, _HB_N = 900.0, 105000.0, 16

QHIST_ORACLE = f"""
SELECT l_returnflag,
       CAST(LEAST(GREATEST(FLOOR((l_extendedprice - {_HB_LO})
                                 / (({_HB_HI} - {_HB_LO}) / {_HB_N})) + 1, 0), {_HB_N} + 1)
            AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
FROM lineitem
WHERE l_returnflag IS NOT NULL AND l_extendedprice IS NOT NULL
GROUP BY l_returnflag, bucket
ORDER BY l_returnflag, bucket
"""


@declare(
    "q_value_histogram",
    oracle=QHIST_ORACLE,
    description="equi-width histogram per group via width_bucket (profiling [ext])",
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): a NULL value has no bucket
    # (SQL GREATEST skips NULLs and would clamp it to bucket 0)
    li = li.filter(
        F.col("l_returnflag").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    return (
        li.groupBy(
            "l_returnflag",
            F.width_bucket(
                "l_extendedprice", F.lit(_HB_LO), F.lit(_HB_HI), F.lit(_HB_N)
            )
            .cast("long")
            .alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
                    "double"
                ),
                2,
            ).alias("total"),
        )
        .orderBy("l_returnflag", "bucket")
    )


# ---------------------------------------------------------------------------
# Bounded EWMA (half-life smoothing over the last 8 observations):
# weights are exact powers of two (α = 1/2), the weighted sum runs
# left-to-right over the frame-ordered value list in both engines,
# and the geometric normalizer is closed-form — deterministic without
# decimal machinery.  The window is ROWS-bounded, so state is O(8)
# per key at any scale (the streaming form is the same expression
# over applyInPandasWithState history).
QEWMA_ORACLE = """
WITH l AS (
  SELECT event_id, user_id, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vs
  FROM events
  WHERE value IS NOT NULL AND ts IS NOT NULL
)
SELECT event_id, user_id, value,
       ROUND(list_sum(list_transform(range(1, len(vs) + 1),
                      i -> vs[i] * pow(0.5, len(vs) - i + 1)))
             / (1 - pow(0.5, len(vs))), 6) AS ewma
FROM l
ORDER BY event_id
"""


@declare(
    "q_ewma_events",
    oracle=QEWMA_ORACLE,
    description="bounded exponential moving average (power-of-two weights, closed-form normalizer) (W3 [ext])",
)
def q_ewma_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL values AND null timestamps are excluded EXPLICITLY on both
    # sides: Spark's collect_list silently drops NULL values while
    # DuckDB's list() keeps them (shifting len(vs)/weights), and the
    # two engines default to opposite NULL placement in ASC ordering
    # (Spark NULLS FIRST, DuckDB NULLS LAST) so a null ts would shift
    # the ROWS frame — without both filters the equivalence holds only
    # on non-null fixture data (ADVICE r3/r4; null-injection test in
    # tests/test_round5_fixes.py).
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    w8 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    vs = F.collect_list("value").over(w8)
    d = ev.select("event_id", "user_id", "value", vs.alias("vs"))
    n = F.size("vs")
    num = F.aggregate(
        F.zip_with(
            F.col("vs"),
            F.sequence(F.lit(1), n),
            lambda v, i: v * F.pow(F.lit(0.5), (n - i + 1).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ewma = num / (F.lit(1.0) - F.pow(F.lit(0.5), n.cast("double")))
    return d.select(
        "event_id", "user_id", "value", F.round(ewma, 6).alias("ewma")
    ).orderBy("event_id")
