"""Round-8 declared queries: entity-resolution scoring, annotation
quality, corpus novelty, and distribution-distance families new at
round 6's close — Fellegi–Sunter probabilistic record linkage (the
scored complement of round-7's reciprocal-best-match ER), Cohen's
kappa inter-annotator agreement, n-gram novelty scoring of a held-out
split against the training split's gram vocabulary, the 1-D
Wasserstein (earth-mover) distance companion to the KS test, the Hill
tail-index estimator, a deterministic Poisson-half bootstrap CI for
the mean, and Herfindahl–Hirschman supplier-concentration audits.

Determinism contract (same as round6b-7): money stays decimal, every
ranking carries an explicit tie-break, md5 is the only hash, log-odds
weights enter both engines as identical decimal literals computed
once driver-side, and float reductions are per-term rounded then
DECIMAL-summed (order-free) with display rounding at 6 decimals.

Scale notes (100 TB): the linkage join is blocked (never cross), the
novelty join shuffles on gram (inverted-index discipline — no
broadcast assumption on the vocabulary), Wasserstein/KS windows
partition by the bounded pair key, the bootstrap explodes a constant
64 replicas map-side before a 64-group aggregate, and HHI/kappa are
scan + group-by plans with dimension-sized outputs.  No collect, no
cross product, no single-partition window over unbounded rows
(hill's 501-row top-k is TakeOrderedAndProject — per-partition top-k
then a bounded merge).

Reference scope: the reference engine delegates relational semantics
to Spark (SURVEY §0); these are [ext] families from the LLM-pipeline
brief (label QA, corpus curation, drift/distance metrics, ER).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.llm import _zipgrams
from jibaro_spark.queries.registry import declare, load_tables

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


def _md5_mod(col, salt: str, n: int):
    """First-8-hex-digit md5 bucket — the repo's cross-engine hash
    (replays in DuckDB as CAST('0x'||substr(md5(...),1,8) AS BIGINT))."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}|"), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n))


def _sql_md5_mod(expr: str, salt: str, n: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{salt}|' || CAST({expr} AS VARCHAR)), 1, 8))"
        f" AS BIGINT) % {n}"
    )


# ---------------------------------------------------------------------------
# Fellegi–Sunter record linkage ([ext] entity resolution).  System B
# is a deterministically-degraded replica of the customer master (10%
# reversed names, 10% shifted balances, 10% nulled-to-UNKNOWN
# segments — independent md5 salts), the classic "link the CRM export
# back to the master" workload.  Candidates are blocked on the
# uncorrupted nation key; each pair is scored by summing per-field
# log-odds agreement weights (identical decimal literals in both
# engines) and banded into match/possible/non-match.  The oracle
# replays degradation, blocking, scoring, and banding, so the driver
# hash-checks the whole linkage decision surface.  Scale: the shuffle
# is the blocking join (fan-out = block size, caller-controlled);
# scoring is map-side codegen; production blocks on composite keys
# (nation × name-prefix × simhash band) to bound blocks at 100 TB.
_FS_NAME_M, _FS_NAME_U = 0.9, 0.0001
_FS_BAL_M, _FS_BAL_U = 0.85, 0.001
_FS_SEG_M, _FS_SEG_U = 0.8, 0.2
_W_NAME_A = round(math.log2(_FS_NAME_M / _FS_NAME_U), 6)
_W_NAME_D = round(math.log2((1 - _FS_NAME_M) / (1 - _FS_NAME_U)), 6)
_W_BAL_A = round(math.log2(_FS_BAL_M / _FS_BAL_U), 6)
_W_BAL_D = round(math.log2((1 - _FS_BAL_M) / (1 - _FS_BAL_U)), 6)
_W_SEG_A = round(math.log2(_FS_SEG_M / _FS_SEG_U), 6)
_W_SEG_D = round(math.log2((1 - _FS_SEG_M) / (1 - _FS_SEG_U)), 6)
_FS_UPPER, _FS_LOWER = 12.0, 0.0

QLINK_ORACLE = f"""
WITH a AS (
  SELECT c_custkey AS a_key, c_name AS a_name,
         CAST(c_acctbal AS DECIMAL(18,2)) AS a_bal,
         c_mktsegment AS a_seg, c_nationkey AS a_nat
  FROM customer
), b AS (
  SELECT c_custkey AS b_key,
         CASE WHEN {_sql_md5_mod('c_custkey', 'n', 10)} = 0
              THEN reverse(c_name) ELSE c_name END AS b_name,
         CASE WHEN {_sql_md5_mod('c_custkey', 'b', 10)} = 0
              THEN CAST(c_acctbal AS DECIMAL(18,2)) + 100.00
              ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS b_bal,
         CASE WHEN {_sql_md5_mod('c_custkey', 's', 10)} = 0
              THEN 'UNKNOWN' ELSE c_mktsegment END AS b_seg,
         c_nationkey AS b_nat
  FROM customer
), scored AS (
  SELECT a_key, b_key,
         CAST(CAST(CASE WHEN a_name = b_name THEN {_W_NAME_A} ELSE {_W_NAME_D} END AS DECIMAL(18,6))
            + CAST(CASE WHEN a_bal  = b_bal  THEN {_W_BAL_A}  ELSE {_W_BAL_D}  END AS DECIMAL(18,6))
            + CAST(CASE WHEN a_seg  = b_seg  THEN {_W_SEG_A}  ELSE {_W_SEG_D}  END AS DECIMAL(18,6))
           AS DECIMAL(28,6)) AS score
  FROM a JOIN b ON a_nat = b_nat
)
SELECT a_key, b_key, ROUND(CAST(score AS DOUBLE), 6) AS score,
       CASE WHEN score >= {_FS_UPPER} THEN 'match'
            WHEN score <= {_FS_LOWER} THEN 'non_match'
            ELSE 'possible' END AS decision
FROM scored
WHERE score > {_FS_LOWER}
ORDER BY a_key, b_key
"""


@declare(
    "q_record_linkage",
    oracle=QLINK_ORACLE,
    description="Fellegi-Sunter probabilistic record linkage of a degraded customer replica: nation-blocked candidates, decimal log-odds field scores, match/possible banding (ER [ext])",
)
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.linkage import FieldComparator, fellegi_sunter_join

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        bal.alias("a_bal"),
        F.col("c_mktsegment").alias("a_seg"),
        F.col("c_nationkey").alias("a_nat"),
    )
    b = cust.select(
        F.col("c_custkey").alias("b_key"),
        F.when(_md5_mod(F.col("c_custkey"), "n", 10) == 0, F.reverse(F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.when(
            _md5_mod(F.col("c_custkey"), "b", 10) == 0,
            bal + F.lit("100.00").cast("decimal(18,2)"),
        )
        .otherwise(bal)
        .alias("b_bal"),
        F.when(_md5_mod(F.col("c_custkey"), "s", 10) == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        F.col("c_nationkey").alias("b_nat"),
    )
    pairs = fellegi_sunter_join(
        a,
        b,
        "a_key",
        "b_key",
        block_on=[("a_nat", "b_nat")],
        comparators=[
            FieldComparator("name", F.col("a_name") == F.col("b_name"), _FS_NAME_M, _FS_NAME_U),
            FieldComparator("bal", F.col("a_bal") == F.col("b_bal"), _FS_BAL_M, _FS_BAL_U),
            FieldComparator("seg", F.col("a_seg") == F.col("b_seg"), _FS_SEG_M, _FS_SEG_U),
        ],
        upper=_FS_UPPER,
        lower=_FS_LOWER,
    )
    return (
        pairs.filter(F.col("decision") != "non_match")
        .select(
            "a_key",
            "b_key",
            F.round(F.col("score").cast("double"), 6).alias("score"),
            "decision",
        )
        .orderBy("a_key", "b_key")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa ([ext] annotation QA).  Annotator A is the fixture's
# lang label; annotator B is a deterministic degradation that
# relabels 10% of docs (md5 bucket) to the majority class 'en' — the
# canonical "second annotator defaults to the easy label" failure.
# po/pe come from exact integer confusion counts; the expected-
# agreement products run in DECIMAL(38,0) (BIGINT would wrap at
# ~1e12-doc margins, the ADVICE r5 overflow pattern).  One scan, two
# class-sized group-bys, single-row output.
QKAPPA_ORACLE = f"""
WITH d AS (
  SELECT lang AS a,
         CASE WHEN {_sql_md5_mod('doc_id', 'k', 10)} = 0 THEN 'en' ELSE lang END AS b
  FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
  FROM d
), ma AS (
  SELECT a AS cls, CAST(COUNT(*) AS BIGINT) AS na FROM d GROUP BY a
), mb AS (
  SELECT b AS cls, CAST(COUNT(*) AS BIGINT) AS nb FROM d GROUP BY b
), pe AS (
  SELECT CAST(SUM(CAST(ma.na AS DECIMAL(38,0)) * mb.nb) AS DECIMAL(38,0)) AS pe_num
  FROM ma JOIN mb USING (cls)
)
SELECT tot.n AS n_docs,
       ROUND(CAST(tot.n_agree AS DOUBLE) / tot.n, 6) AS po,
       ROUND(CAST(pe.pe_num AS DOUBLE)
             / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)), 6) AS pe,
       ROUND((CAST(tot.n_agree AS DOUBLE) / tot.n
              - CAST(pe.pe_num AS DOUBLE) / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE)))
             / (1.0 - CAST(pe.pe_num AS DOUBLE) / (CAST(tot.n AS DOUBLE) * CAST(tot.n AS DOUBLE))), 6) AS kappa
FROM tot, pe
"""


@declare(
    "q_cohen_kappa",
    oracle=QKAPPA_ORACLE,
    description="Cohen's kappa between the lang label and a 10%-degraded second annotator: exact integer confusion margins, DECIMAL(38,0) expected-agreement products (annotation QA [ext])",
)
def q_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        F.col("lang").alias("a"),
        F.when(_md5_mod(F.col("doc_id"), "k", 10) == 0, F.lit("en"))
        .otherwise(F.col("lang"))
        .alias("b"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_agree"),
    )
    ma = d.groupBy(F.col("a").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("na")
    )
    mb = d.groupBy(F.col("b").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    pe = (
        ma.join(mb, "cls")
        .agg(
            F.sum(F.col("na").cast("decimal(38,0)") * F.col("nb"))
            .cast("decimal(38,0)")
            .alias("pe_num")
        )
    )
    j = tot.crossJoin(pe)
    n_d = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / n_d
    pe_v = F.col("pe_num").cast("double") / (n_d * n_d)
    return j.select(
        F.col("n").alias("n_docs"),
        F.round(po, 6).alias("po"),
        F.round(pe_v, 6).alias("pe"),
        F.round((po - pe_v) / (F.lit(1.0) - pe_v), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# n-gram novelty of the held-out split ([ext] corpus curation).  Docs
# hash-split 80/20; each test doc's distinct word trigrams are probed
# against the train split's gram vocabulary, and the doc is scored by
# its fraction of never-seen-in-train grams — the memorization/
# novelty complement of q_decontaminate's overlap direction.  The
# probe is a gram-keyed LEFT join (inverted-index discipline: the
# vocabulary shuffles on gram, NO broadcast assumption — at 100 TB
# the gram vocabulary is corpus-sized), then a per-doc count
# aggregate.  Trigram generation is the repo's shingle idiom (bind
# the token array once; clamp short docs to one shingle).
QNOVEL_ORACLE = f"""
WITH tk AS (
  -- bind the token list ONCE (_zipgrams caller contract): the k-gram
  -- fragment interpolates its argument into k shifted views
  SELECT doc_id, {_sql_md5_mod('doc_id', 'v', 5)} AS bucket,
         {_TOKS} AS words
  FROM documents
), sh AS (
  SELECT doc_id, bucket,
         unnest(list_distinct({_zipgrams('words', 3)})) AS g
  FROM tk
), vocab AS (
  SELECT DISTINCT g FROM sh WHERE bucket <> 0
), test AS (
  SELECT doc_id, g FROM sh WHERE bucket = 0
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(CAST(SUM(CASE WHEN v.g IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS novelty
FROM test t LEFT JOIN vocab v USING (g)
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@declare(
    "q_ngram_novelty",
    oracle=QNOVEL_ORACLE,
    description="Per-held-out-doc trigram novelty vs the train split's gram vocabulary: hash 80/20 split, gram-keyed anti-probe, novelty fraction (curation [ext])",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import shingles

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sh = docs.select(
        "doc_id",
        _md5_mod(F.col("doc_id"), "v", 5).alias("bucket"),
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("g"),
    )
    vocab = sh.filter(F.col("bucket") != 0).select("g").distinct().withColumn(
        "seen", F.lit(1)
    )
    test = sh.filter(F.col("bucket") == 0).select("doc_id", "g")
    return (
        test.join(vocab, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("seen").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias(
                "novelty"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# 1-D Wasserstein (earth-mover) distance between every order-priority
# pair's price distribution — the integral companion to q_ks_test's
# max ECDF gap: W1 = ∫|F_a − F_b| dv on the pooled value grid.  The
# per-gap term |ca·nb − cb·na| · Δv runs integer-exact (counts cross-
# multiplied, gaps in cents) and DECIMAL(38,0)-summed; one double
# division at display.  Same bounded-pair-key window shape as the KS
# test (10 pairs), same pooled fan-out bound.
QW1_ORACLE = """
WITH d AS (
  SELECT o_orderpriority AS pr, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2
), pairs AS (
  SELECT a.pr AS pa, b.pr AS pb
  FROM (SELECT DISTINCT pr FROM d) a JOIN (SELECT DISTINCT pr FROM d) b
  ON a.pr < b.pr
), pooled AS (
  SELECT p.pa, p.pb, d.v,
         SUM(CASE WHEN d.pr = p.pa THEN d.cnt ELSE 0 END) AS da,
         SUM(CASE WHEN d.pr = p.pb THEN d.cnt ELSE 0 END) AS db
  FROM pairs p JOIN d ON d.pr IN (p.pa, p.pb)
  GROUP BY 1, 2, 3
), c AS (
  SELECT pa, pb, v,
         SUM(da) OVER (PARTITION BY pa, pb ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
         SUM(db) OVER (PARTITION BY pa, pb ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
         SUM(da) OVER (PARTITION BY pa, pb) AS na,
         SUM(db) OVER (PARTITION BY pa, pb) AS nb,
         CAST((LEAD(v) OVER (PARTITION BY pa, pb ORDER BY v) - v) * 100
              AS BIGINT) AS dv_cents
  FROM pooled
)
SELECT pa, pb,
       CAST(MAX(na) AS BIGINT) AS n_a,
       CAST(MAX(nb) AS BIGINT) AS n_b,
       ROUND(CAST(SUM(CAST(abs(ca * nb - cb * na) * dv_cents AS DECIMAL(38,0)))
                  AS DOUBLE)
             / (CAST(MAX(na) AS DOUBLE) * CAST(MAX(nb) AS DOUBLE) * 100.0),
             6) AS w1
FROM c
GROUP BY pa, pb
ORDER BY pa, pb
"""


@declare(
    "q_wasserstein_1d",
    oracle=QW1_ORACLE,
    description="1-D Wasserstein distance for every order-priority pair: integer-exact ECDF-gap-times-cents terms, DECIMAL(38,0) sum (stats [ext])",
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    d = o.groupBy(
        F.col("o_orderpriority").alias("pr"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    prs = d.select("pr").distinct()
    pairs = (
        prs.alias("a")
        .join(prs.alias("b"), F.col("a.pr") < F.col("b.pr"))
        .select(F.col("a.pr").alias("pa"), F.col("b.pr").alias("pb"))
    )
    pooled = (
        F.broadcast(pairs)
        .join(d, (d["pr"] == F.col("pa")) | (d["pr"] == F.col("pb")))
        .groupBy("pa", "pb", "v")
        .agg(
            F.sum(F.when(F.col("pr") == F.col("pa"), F.col("cnt")).otherwise(0)).alias("da"),
            F.sum(F.when(F.col("pr") == F.col("pb"), F.col("cnt")).otherwise(0)).alias("db"),
        )
    )
    ordw = Window.partitionBy("pa", "pb").orderBy("v")
    cum = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pw = Window.partitionBy("pa", "pb")
    # explicit pair-keyed exchange (r12, the q_ks_test treatment —
    # same pooled-pair ECDF shape; AQE otherwise coalesces the 10 pair
    # groups onto 2-3 tasks for the CPU-dense cum/lead windows)
    from jibaro_spark.operators.util import dense_exchange

    pooled = dense_exchange(pooled, "pa", "pb")
    c = pooled.select(
        "pa",
        "pb",
        F.sum("da").over(cum).alias("ca"),
        F.sum("db").over(cum).alias("cb"),
        F.sum("da").over(pw).alias("na"),
        F.sum("db").over(pw).alias("nb"),
        ((F.lead("v").over(ordw) - F.col("v")) * 100).cast("bigint").alias("dv_cents"),
    )
    term = (F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")) * F.col("dv_cents")).cast(
        "decimal(38,0)"
    )
    return (
        c.groupBy("pa", "pb")
        .agg(
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
            F.round(
                F.sum(term).cast("double")
                / (F.max("na").cast("double") * F.max("nb").cast("double") * F.lit(100.0)),
                6,
            ).alias("w1"),
        )
        .orderBy("pa", "pb")
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator ([ext] stats): α̂ = k / Σ ln(x_i / x_(k+1))
# over the k largest order prices.  The top-(k+1) is Spark's
# TakeOrderedAndProject (per-partition top-k, bounded merge — no
# global sort), the threshold joins back as a broadcast 1-row agg,
# and the ln terms are per-row rounded then DECIMAL-summed (the
# entropy queries' order-free float discipline).  Ties at the cut are
# harmless by construction: a tied row's term is ln(1) = 0.
QHILL_ORACLE = """
WITH top AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders ORDER BY v DESC LIMIT 501
), thr AS (
  SELECT MIN(v) AS xk1 FROM top
)
SELECT CAST(500 AS BIGINT) AS k,
       ROUND(CAST(MIN(thr.xk1) AS DOUBLE), 2) AS x_threshold,
       ROUND(500.0 / CAST(SUM(CAST(ROUND(ln(CAST(top.v AS DOUBLE)
                                            / CAST(thr.xk1 AS DOUBLE)), 10)
                                   AS DECIMAL(18,10))) AS DOUBLE), 6) AS alpha
FROM top, thr
"""


@declare(
    "q_hill_tail_index",
    oracle=QHILL_ORACLE,
    description="Hill tail-index over the top-500 order prices: TakeOrderedAndProject top-k, broadcast threshold, decimal-summed ln terms (stats [ext])",
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    top = (
        o.select(F.col("o_totalprice").cast("decimal(18,2)").alias("v"))
        .orderBy(F.col("v").desc())
        .limit(501)
    )
    thr = top.agg(F.min("v").alias("xk1"))
    term = F.round(
        F.log(F.col("v").cast("double") / F.col("xk1").cast("double")), 10
    ).cast("decimal(18,10)")
    return top.crossJoin(F.broadcast(thr)).agg(
        F.lit(500).cast("bigint").alias("k"),
        F.round(F.min("xk1").cast("double"), 2).alias("x_threshold"),
        F.round(F.lit(500.0) / F.sum(term).cast("double"), 6).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# Deterministic bootstrap CI for the mean order price ([ext] stats).
# 64 half-sample replicas: replica b keeps row r iff md5(b|key) is
# even, at weight 2 (Bernoulli-half bootstrap — an unbiased
# resampling scheme any engine replays exactly).  Replica means are
# exact integer-cents ratios; the 95% band is the 2nd/63rd order
# statistic of the 64 means (exact, tie-broken by replica id).
# Plan: a constant ×64 map-side explode, partial-aggregated into 64
# groups — shuffle volume is 64 rows regardless of input size.
QBOOT_ORACLE = f"""
WITH reps AS (
  SELECT b.b, o.o_orderkey,
         CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         ({_sql_md5_mod('o_orderkey', 'r', 64)} % 2) * 2 AS w
  FROM orders o, (SELECT unnest(generate_series(0, 63)) AS b) b
), means AS (
  SELECT b, ROUND(CAST(SUM(w * cents) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) / 100.0, 6) AS m
  FROM reps WHERE w > 0 OR TRUE GROUP BY b
), ranked AS (
  SELECT m, ROW_NUMBER() OVER (ORDER BY m, b) AS rn FROM means
), point AS (
  SELECT ROUND(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
               / COUNT(*) / 100.0, 6) AS mean_price
  FROM orders
)
SELECT CAST(64 AS BIGINT) AS n_reps,
       point.mean_price,
       MIN(CASE WHEN rn = 2 THEN m END) AS ci_lo,
       MIN(CASE WHEN rn = 63 THEN m END) AS ci_hi
FROM ranked, point
GROUP BY point.mean_price
"""


@declare(
    "q_bootstrap_ci_mean",
    oracle=QBOOT_ORACLE,
    description="Deterministic 64-replica half-sample bootstrap CI of the mean order price: md5 replica membership, exact cents means, order-statistic band (stats [ext])",
)
def q_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    # r12 (guide §2.3/§2.5): the replicate weight is a function of the
    # ORDER key alone, but it used to sit after the ×64 explode — 9.6M
    # md5 evaluations instead of 150k, all on the single-row-group
    # scan's one core (12.9 s at sf0.1).  Hash the weight once per
    # order, spread, THEN explode the replicate axis.
    from jibaro_spark.operators.util import ensure_parallelism

    per_order = ensure_parallelism(
        o.select(
            F.col("o_orderkey"),
            cents.alias("cents"),
            (F.pmod(_md5_mod(F.col("o_orderkey"), "r", 64), F.lit(2)) * 2).alias(
                "w"
            ),
        ),
        by="o_orderkey",
    )
    reps = per_order.select(
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"),
        "o_orderkey",
        "cents",
        "w",
    )
    means = reps.groupBy("b").agg(
        F.round(
            F.sum(F.col("w") * F.col("cents")).cast("double")
            / F.sum("w").cast("double")
            / F.lit(100.0),
            6,
        ).alias("m")
    )
    rw = Window.orderBy("m", "b")
    ranked = means.select("m", F.row_number().over(rw).alias("rn"))
    band = ranked.agg(
        F.min(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
        F.min(F.when(F.col("rn") == 63, F.col("m"))).alias("ci_hi"),
    )
    point = o.agg(
        F.round(
            F.sum(cents).cast("double") / F.count(F.lit(1)) / F.lit(100.0), 6
        ).alias("mean_price")
    )
    return point.crossJoin(band).select(
        F.lit(64).cast("bigint").alias("n_reps"), "mean_price", "ci_lo", "ci_hi"
    )


# ---------------------------------------------------------------------------
# Herfindahl–Hirschman supplier concentration per nation ([ext]
# analytics/ops): each supplier's share of its nation's lineitem
# revenue, HHI = Σ share².  Revenue stays decimal-exact through the
# supplier aggregate; shares are double ratios of exact decimals and
# the share² terms are per-term rounded then DECIMAL-summed (order-
# free).  Plan: one lineitem scan, suppkey shuffle, broadcast
# supplier→nation dims, 25-row output.
QHHI_ORACLE = """
WITH rev AS (
  SELECT s.s_nationkey,
         l.l_suppkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
             * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS r
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), tot AS (
  SELECT s_nationkey, SUM(r) AS rt, COUNT(*) AS n_suppliers FROM rev GROUP BY 1
)
SELECT n.n_name,
       CAST(tot.n_suppliers AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(CAST(ROUND(
                 (CAST(rev.r AS DOUBLE) / CAST(tot.rt AS DOUBLE))
               * (CAST(rev.r AS DOUBLE) / CAST(tot.rt AS DOUBLE)), 10)
             AS DECIMAL(18,10))) AS DOUBLE), 6) AS hhi
FROM rev
JOIN tot USING (s_nationkey)
JOIN nation n ON n.n_nationkey = rev.s_nationkey
GROUP BY n.n_name, tot.n_suppliers
ORDER BY n.n_name
"""


@declare(
    "q_hhi_concentration",
    oracle=QHHI_ORACLE,
    description="Herfindahl-Hirschman supplier revenue concentration per nation: decimal-exact revenue, decimal-summed share-squared terms (analytics [ext])",
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "supplier", "nation")
    li, sup, nat = t["lineitem"], t["supplier"], t["nation"]
    dprice = F.col("l_extendedprice").cast("decimal(18,4)")
    ddisc = F.col("l_discount").cast("decimal(18,4)")
    rev = (
        li.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
                li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(dprice * (F.lit(1) - ddisc)).alias("r"))
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("r").alias("rt"), F.count(F.lit(1)).alias("n_suppliers")
    )
    share = F.col("r").cast("double") / F.col("rt").cast("double")
    term = F.round(share * share, 10).cast("decimal(18,10)")
    return (
        rev.join(tot, "s_nationkey")
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "n_suppliers")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("hhi"))
        .select(
            "n_name",
            F.col("n_suppliers").cast("bigint").alias("n_suppliers"),
            "hhi",
        )
        .orderBy("n_name")
    )
