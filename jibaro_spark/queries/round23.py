"""Round-23 declared queries — multivariate/reliability statistics,
vocabulary-richness estimators, diversity indices, and directed-graph
reciprocity.

* ``q_partial_correlation`` — first-order partial correlations
  r_xy.z of the lineitem measures from ONE exact-decimal moment pass
  (the controlled-confounder companion of q_corr_matrix).
* ``q_cronbach_alpha`` — internal-consistency reliability of the
  4-measure "scale": α = k/(k−1)·(1 − Σvar_i/var_total), all
  variances from the same moment pass (var_total via the full cross-
  moment sum).
* ``q_icc_anova`` — one-way random-effects intraclass correlation
  ICC(1,1) of acctbal cents within nations, with the unbalanced-design
  k₀ = (N − Σn²/N)/(g−1) group-size correction.
* ``q_chao1_good_turing`` — vocabulary-richness estimators from the
  term frequency-of-frequency spectrum: Chao1 = V + F1²/(2F2) and the
  Good-Turing missing mass F1/N — the "how much vocabulary haven't we
  seen" corpus diagnostics next to Heaps' law.
* ``q_simpson_diversity`` — per-source Simpson diversity
  1 − Σn_i(n_i−1)/(N(N−1)) over term counts, exact integer cells.
* ``q_graph_reciprocity`` — reciprocity of the DIRECTED nation trade
  graph (share of edges whose reverse edge exists) + self-trade
  share; edge-set algebra on nation²-bounded rows.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

_MOM_SQL = """
  SELECT COUNT(*) AS n,
         SUM(x1) AS s1, SUM(x2) AS s2, SUM(x3) AS s3, SUM(x4) AS s4,
         SUM(x1*x1) AS s11, SUM(x1*x2) AS s12, SUM(x1*x3) AS s13,
         SUM(x1*x4) AS s14, SUM(x2*x2) AS s22, SUM(x2*x3) AS s23,
         SUM(x2*x4) AS s24, SUM(x3*x3) AS s33, SUM(x3*x4) AS s34,
         SUM(x4*x4) AS s44
  FROM (SELECT CAST(l_quantity AS DECIMAL(19,4)) AS x1,
               CAST(l_extendedprice AS DECIMAL(19,4)) AS x2,
               CAST(l_discount AS DECIMAL(19,4)) AS x3,
               CAST(l_tax AS DECIMAL(19,4)) AS x4
        FROM lineitem)
"""


def _corr_sql(a: int, b: int) -> str:
    return (
        f"ROUND((n * CAST(s{a}{b} AS DOUBLE) - CAST(s{a} AS DOUBLE) * CAST(s{b} AS DOUBLE))"
        f" / sqrt((n * CAST(s{a}{a} AS DOUBLE) - CAST(s{a} AS DOUBLE) * CAST(s{a} AS DOUBLE))"
        f" * (n * CAST(s{b}{b} AS DOUBLE) - CAST(s{b} AS DOUBLE) * CAST(s{b} AS DOUBLE))), 10)"
    )


QPC_ORACLE = (
    "WITH mom AS ("
    + _MOM_SQL
    + f"""), r AS (
  SELECT {_corr_sql(1, 2)} AS r12, {_corr_sql(1, 3)} AS r13,
         {_corr_sql(1, 4)} AS r14, {_corr_sql(2, 3)} AS r23,
         {_corr_sql(2, 4)} AS r24, {_corr_sql(3, 4)} AS r34
  FROM mom
)
SELECT pair, ROUND(pc, 6) AS partial_corr FROM (
  SELECT 'qty_price_ctrl_discount' AS pair,
         (r12 - r13 * r23) / sqrt((1 - r13 * r13) * (1 - r23 * r23)) AS pc
  FROM r
  UNION ALL
  SELECT 'qty_discount_ctrl_tax',
         (r13 - r14 * r34) / sqrt((1 - r14 * r14) * (1 - r34 * r34)) FROM r
  UNION ALL
  SELECT 'price_tax_ctrl_qty',
         (r24 - r12 * r14) / sqrt((1 - r12 * r12) * (1 - r14 * r14)) FROM r
)
ORDER BY pair
"""
)


def _corr_col(mom, a: int, b: int):
    n = F.col("n")
    num = n * F.col(f"s{a}{b}").cast("double") - F.col(f"s{a}").cast(
        "double"
    ) * F.col(f"s{b}").cast("double")
    den = F.sqrt(
        (
            n * F.col(f"s{a}{a}").cast("double")
            - F.col(f"s{a}").cast("double") * F.col(f"s{a}").cast("double")
        )
        * (
            n * F.col(f"s{b}{b}").cast("double")
            - F.col(f"s{b}").cast("double") * F.col(f"s{b}").cast("double")
        )
    )
    return F.round(num / den, 10)


def _lineitem_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    xs = [
        F.col("l_quantity").cast("decimal(19,4)"),
        F.col("l_extendedprice").cast("decimal(19,4)"),
        F.col("l_discount").cast("decimal(19,4)"),
        F.col("l_tax").cast("decimal(19,4)"),
    ]
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(xs[i]).alias(f"s{i+1}") for i in range(4)]
    for i in range(4):
        for j in range(i, 4):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"s{i+1}{j+1}"))
    # project to the four measures + hash-spread before the 15-term
    # decimal multiply-accumulate (r12, the PCA moment-pass treatment:
    # the map-side partial agg otherwise runs on the single-row-group
    # scan's ONE core; decimal sums are order-free exact, so placement
    # cannot change a moment)
    from jibaro_spark.operators.util import ensure_parallelism

    li = ensure_parallelism(
        li.select("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        by="l_extendedprice",
    )
    return li.agg(*aggs)


@declare(
    "q_partial_correlation",
    oracle=QPC_ORACLE,
    description="First-order partial correlations r_xy.z of the lineitem measures from one exact-decimal moment pass — the controlled-confounder companion of q_corr_matrix (multivariate stats [ext])",
)
def q_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    mom = _lineitem_moments(spark, sf_dir)
    r = mom.select(
        _corr_col(mom, 1, 2).alias("r12"),
        _corr_col(mom, 1, 3).alias("r13"),
        _corr_col(mom, 1, 4).alias("r14"),
        _corr_col(mom, 2, 3).alias("r23"),
        _corr_col(mom, 2, 4).alias("r24"),
        _corr_col(mom, 3, 4).alias("r34"),
    ).localCheckpoint(eager=True)  # 1 row; the 3 union branches below
    # would otherwise each re-run the full moment scan

    def pc(rxy, rxz, ryz):
        return (F.col(rxy) - F.col(rxz) * F.col(ryz)) / F.sqrt(
            (1 - F.col(rxz) * F.col(rxz)) * (1 - F.col(ryz) * F.col(ryz))
        )

    rows = [
        ("qty_price_ctrl_discount", pc("r12", "r13", "r23")),
        ("qty_discount_ctrl_tax", pc("r13", "r14", "r34")),
        ("price_tax_ctrl_qty", pc("r24", "r12", "r14")),
    ]
    out = None
    for name, expr in rows:
        part = r.select(
            F.lit(name).alias("pair"), F.round(expr, 6).alias("partial_corr")
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("pair")


# ---------------------------------------------------------------------------
# Cronbach's alpha.  var_total is the variance of the item SUM —
# assembled from the full cross-moment sum, never a second pass.

QCA_ORACLE = (
    "WITH mom AS ("
    + _MOM_SQL
    + """)
SELECT 4 AS k,
       ROUND(4.0 / 3.0 * (1.0 -
         (((n * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
          + (n * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))
          + (n * CAST(s33 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))
          + (n * CAST(s44 AS DOUBLE) - CAST(s4 AS DOUBLE) * CAST(s4 AS DOUBLE)))
         /
         (n * (CAST(s11 AS DOUBLE) + CAST(s22 AS DOUBLE) + CAST(s33 AS DOUBLE)
               + CAST(s44 AS DOUBLE)
               + 2 * (CAST(s12 AS DOUBLE) + CAST(s13 AS DOUBLE)
                      + CAST(s14 AS DOUBLE) + CAST(s23 AS DOUBLE)
                      + CAST(s24 AS DOUBLE) + CAST(s34 AS DOUBLE)))
          - (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
             + CAST(s4 AS DOUBLE))
            * (CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
               + CAST(s4 AS DOUBLE))))), 6) AS alpha
FROM mom
"""
)


@declare(
    "q_cronbach_alpha",
    oracle=QCA_ORACLE,
    description="Cronbach's alpha internal-consistency reliability of the 4 lineitem measures: item variances + sum-variance from the full cross-moment pass (psychometrics [ext])",
)
def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    mom = _lineitem_moments(spark, sf_dir)
    n = F.col("n")

    def var(i):
        return n * F.col(f"s{i}{i}").cast("double") - F.col(f"s{i}").cast(
            "double"
        ) * F.col(f"s{i}").cast("double")

    sum_items = (
        F.col("s11").cast("double")
        + F.col("s22").cast("double")
        + F.col("s33").cast("double")
        + F.col("s44").cast("double")
        + 2
        * (
            F.col("s12").cast("double")
            + F.col("s13").cast("double")
            + F.col("s14").cast("double")
            + F.col("s23").cast("double")
            + F.col("s24").cast("double")
            + F.col("s34").cast("double")
        )
    )
    s_tot = (
        F.col("s1").cast("double")
        + F.col("s2").cast("double")
        + F.col("s3").cast("double")
        + F.col("s4").cast("double")
    )
    var_total = n * sum_items - s_tot * s_tot
    alpha = F.lit(4.0) / 3.0 * (F.lit(1.0) - (var(1) + var(2) + var(3) + var(4)) / var_total)
    return mom.select(F.lit(4).alias("k"), F.round(alpha, 6).alias("alpha"))


# ---------------------------------------------------------------------------
# ICC(1,1) with the unbalanced k0 correction, over acctbal cents
# within nations — exact integer group moments.

QICC_ORACLE = """
WITH pts AS (
  SELECT c_nationkey AS g, CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v
  FROM customer
), grp AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(v AS HUGEINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS BIGINT) AS ss
  FROM pts GROUP BY g
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS gcnt, CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(CAST(s AS HUGEINT)) AS BIGINT) AS st,
         CAST(SUM(CAST(ss AS HUGEINT)) AS BIGINT) AS sst,
         CAST(SUM(CAST(ROUND(CAST(s AS DOUBLE) * s / n, 6) AS DECIMAL(28,8)))
              AS DOUBLE) AS sq_over_n,
         CAST(SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS BIGINT) AS sum_n2
  FROM grp
), ms AS (
  SELECT gcnt, nn,
         (sq_over_n - CAST(st AS DOUBLE) * st / nn) / (gcnt - 1) AS msb,
         (CAST(sst AS DOUBLE) - sq_over_n) / (nn - gcnt) AS msw,
         (CAST(nn AS DOUBLE) - CAST(sum_n2 AS DOUBLE) / nn) / (gcnt - 1) AS k0
  FROM tot
)
SELECT gcnt AS n_groups, nn AS n_rows, ROUND(k0, 6) AS k0,
       ROUND((msb - msw) / (msb + (k0 - 1) * msw), 6) AS icc
FROM ms
"""


@declare(
    "q_icc_anova",
    oracle=QICC_ORACLE,
    description="One-way random-effects intraclass correlation ICC(1,1) of acctbal cents within nations, unbalanced k0 group-size correction, exact integer moments (reliability [ext])",
)
def q_icc_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    pts = cust.select(
        F.col("c_nationkey").alias("g"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("v"),
    )
    grp = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("ss"),
    )
    sq_over_n = F.round(
        F.col("s").cast("double") * F.col("s") / F.col("n"), 6
    ).cast("decimal(28,8)")
    tot = grp.agg(
        F.count(F.lit(1)).cast("long").alias("gcnt"),
        F.sum("n").cast("long").alias("nn"),
        F.sum("s").cast("long").alias("st"),
        F.sum("ss").cast("long").alias("sst"),
        F.sum(sq_over_n).cast("double").alias("sq_over_n"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("sum_n2"),
    )
    msb = (
        F.col("sq_over_n") - F.col("st").cast("double") * F.col("st") / F.col("nn")
    ) / (F.col("gcnt") - 1)
    msw = (F.col("sst").cast("double") - F.col("sq_over_n")) / (
        F.col("nn") - F.col("gcnt")
    )
    k0 = (F.col("nn").cast("double") - F.col("sum_n2").cast("double") / F.col("nn")) / (
        F.col("gcnt") - 1
    )
    return tot.select(
        F.col("gcnt").alias("n_groups"),
        F.col("nn").alias("n_rows"),
        F.round(k0, 6).alias("k0"),
        F.round((msb - msw) / (msb + (k0 - 1) * msw), 6).alias("icc"),
    )


# ---------------------------------------------------------------------------
# Chao1 + Good-Turing from the term frequency-of-frequency spectrum.

QCHAO_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                ' ')) AS term
  FROM documents
), tf AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS f FROM toks GROUP BY term
), spec AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS v,
         CAST(SUM(f) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM tf
)
SELECT v, n_tokens, f1, f2,
       ROUND(v + CASE WHEN f2 > 0
             THEN CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)
             ELSE CAST(f1 AS DOUBLE) * (f1 - 1) / 2.0 END, 6) AS chao1,
       ROUND(CAST(f1 AS DOUBLE) / n_tokens, 6) AS missing_mass
FROM spec
"""


@declare(
    "q_chao1_good_turing",
    oracle=QCHAO_ORACLE,
    description="Vocabulary-richness estimators from the term frequency-of-frequency spectrum: Chao1 unseen-species estimate + Good-Turing missing mass — the unseen-vocabulary diagnostics beside Heaps' law (corpus stats [ext])",
)
def q_chao1_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    spec = tf.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.sum((F.col("f") == 1).cast("int")).cast("long").alias("f1"),
        F.sum((F.col("f") == 2).cast("int")).cast("long").alias("f2"),
    )
    chao1 = F.col("v") + F.when(
        F.col("f2") > 0,
        F.col("f1").cast("double") * F.col("f1") / (2.0 * F.col("f2")),
    ).otherwise(F.col("f1").cast("double") * (F.col("f1") - 1) / 2.0)
    return spec.select(
        "v",
        "n_tokens",
        "f1",
        "f2",
        F.round(chao1, 6).alias("chao1"),
        F.round(F.col("f1").cast("double") / F.col("n_tokens"), 6).alias(
            "missing_mass"
        ),
    )


# ---------------------------------------------------------------------------
# Simpson diversity per source: 1 − Σ n_i(n_i−1) / (N(N−1)), exact
# integer numerators in DECIMAL(38,0) so the identity survives any N.

QSIMP_ORACLE = """
WITH toks AS (
  SELECT source,
         unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                ' ')) AS term
  FROM documents
), tf AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
  GROUP BY source, term
), agg AS (
  SELECT source,
         CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(CAST(n AS HUGEINT) * (n - 1)) AS DECIMAL(38,0)) AS pairs
  FROM tf GROUP BY source
)
SELECT source, nn AS n_tokens,
       ROUND(1.0 - CAST(pairs AS DOUBLE)
             / (CAST(nn AS DOUBLE) * (nn - 1)), 6) AS simpson_d
FROM agg ORDER BY source
"""


@declare(
    "q_simpson_diversity",
    oracle=QSIMP_ORACLE,
    description="Simpson diversity index 1 − Σn_i(n_i−1)/(N(N−1)) of the per-source term distribution — exact integer pair counts, the evenness companion of per-source entropy (corpus stats [ext])",
)
def q_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tf = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    agg = tf.groupBy("source").agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum((F.col("n") * (F.col("n") - 1)).cast("decimal(38,0)")).alias("pairs"),
    )
    return agg.select(
        "source",
        F.col("nn").alias("n_tokens"),
        F.round(
            F.lit(1.0)
            - F.col("pairs").cast("double")
            / (F.col("nn").cast("double") * (F.col("nn") - 1)),
            6,
        ).alias("simpson_d"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Directed-graph reciprocity of the nation trade graph.

QRECIP_ORACLE = """
WITH e AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
), nonself AS (
  SELECT src, dst FROM e WHERE src <> dst
), recip AS (
  SELECT a.src, a.dst FROM nonself a
  JOIN nonself b ON b.src = a.dst AND b.dst = a.src
)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM e WHERE src = dst) AS BIGINT) AS n_self,
       CAST((SELECT COUNT(*) FROM nonself) AS BIGINT) AS n_directed,
       CAST((SELECT COUNT(*) FROM recip) AS BIGINT) AS n_reciprocated,
       ROUND(CAST((SELECT COUNT(*) FROM recip) AS DOUBLE)
             / (SELECT COUNT(*) FROM nonself), 6) AS reciprocity
"""


@declare(
    "q_graph_reciprocity",
    oracle=QRECIP_ORACLE,
    description="Reciprocity of the directed nation trade graph (share of non-self edges whose reverse exists) + self-trade count — edge-set algebra on nation²-bounded rows (graph [ext])",
)
def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer", "supplier")
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .select(
            F.col("c_nationkey").cast("long").alias("src"),
            F.col("s_nationkey").cast("long").alias("dst"),
        )
        .distinct()
    )
    e = e.localCheckpoint(eager=True)  # three consumers below
    nonself = e.filter(F.col("src") != F.col("dst"))
    rev = nonself.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = nonself.join(rev, ["src", "dst"], "left_semi")
    stats_e = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum((F.col("src") == F.col("dst")).cast("int"))
        .cast("long")
        .alias("n_self"),
    )
    stats_ns = nonself.agg(F.count(F.lit(1)).cast("long").alias("n_directed"))
    stats_r = recip.agg(F.count(F.lit(1)).cast("long").alias("n_reciprocated"))
    return (
        stats_e.crossJoin(F.broadcast(stats_ns))
        .crossJoin(F.broadcast(stats_r))
        .select(
            "n_edges",
            "n_self",
            "n_directed",
            "n_reciprocated",
            F.round(
                F.col("n_reciprocated").cast("double") / F.col("n_directed"), 6
            ).alias("reciprocity"),
        )
    )
