"""Round-17 declared queries — product/behavioural analytics and the
multiple-testing / divergence / calibration wing.

* ``q_benjamini_hochberg`` — the BH step-up FDR procedure over
  per-nation Welch z-tests (BUILDING segment vs rest): exact decimal
  moments → z, two-sided p via the standard logistic approximation to
  the normal CDF (rounded-addend), then the step-up over m=|nations|
  hypotheses.  The ranking window spans the HYPOTHESIS set (≤ #nations
  rows), not the data — bounded at any corpus size.
* ``q_jensen_shannon`` — symmetric, bounded divergence between the
  R-flag and N-flag price-band distributions: integer band counts,
  per-band contributions rounded then decimal-summed, JSD in nats.
* ``q_cramers_v`` — association strength of (orderpriority ×
  orderstatus): chi-square over the ≤(5×3) contingency cells from
  integer counts, V = sqrt(chi2 / (N·(min(r,c)−1))).
* ``q_brier_calibration`` — deterministic md5 train/test split; a
  per-quantity-band return-rate model trained on one half scores the
  other; reliability diagram (decile bins of predicted p) with per-bin
  Brier score, mean prediction, and observed rate.

Scale notes: every query is counts-first (integer cells collapse
before any window), the only windows are over bounded sets (BH over
#nations hypotheses, contingency cells), and the only cross joins are
1-row scalar broadcasts.  Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Benjamini–Hochberg step-up over per-nation Welch z-tests.  The
# two-sided p-value uses the standard logistic approximation to the
# normal CDF, Phi(z) ~ 1/(1+exp(-1.702 z)) (Haley 1952 constant),
# with every transcendental output rounded to 10 before reuse — the
# repo's established cross-engine exp/ln discipline.  The BH ranking
# window spans m = #nations rows only.

QBH_ORACLE = """
WITH cells AS (
  SELECT c_nationkey,
         CAST(c_mktsegment = 'BUILDING' AS INT) AS grp,
         COUNT(*) AS n,
         SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s,
         SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2)))
           AS ss
  FROM customer GROUP BY c_nationkey, CAST(c_mktsegment = 'BUILDING' AS INT)
), wide AS (
  SELECT c_nationkey,
         MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN s END) AS s1,
         MAX(CASE WHEN grp = 1 THEN ss END) AS ss1,
         MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN s END) AS s0,
         MAX(CASE WHEN grp = 0 THEN ss END) AS ss0
  FROM cells GROUP BY c_nationkey
  HAVING MAX(CASE WHEN grp = 1 THEN n END) >= 2
     AND MAX(CASE WHEN grp = 0 THEN n END) >= 2
), z AS (
  SELECT c_nationkey,
         ROUND(
           (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
           / sqrt(
               (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
                 / (n1 - 1) / n1
             + (CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0)
                 / (n0 - 1) / n0
           ), 8) AS z
  FROM wide
), p AS (
  SELECT c_nationkey, z,
         ROUND(2.0 / (1.0 + ROUND(exp(1.702 * abs(z)), 10)), 10) AS p_value
  FROM z
), ranked AS (
  SELECT c_nationkey, z, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value, c_nationkey) AS rk,
         COUNT(*) OVER () AS m
  FROM p
), thresh AS (
  SELECT *, ROUND(0.10 * rk / m, 10) AS bh_threshold,
         MAX(CASE WHEN p_value <= ROUND(0.10 * rk / m, 10) THEN rk ELSE 0 END)
           OVER () AS k
  FROM ranked
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, z, p_value,
       CAST(rk AS BIGINT) AS rank, bh_threshold,
       CAST(rk <= k AS BOOLEAN) AS rejected
FROM thresh
ORDER BY rank
"""


@declare(
    "q_benjamini_hochberg",
    oracle=QBH_ORACLE,
    description="Benjamini–Hochberg FDR step-up over per-nation Welch z-tests (BUILDING vs rest acctbal): exact decimal moments, logistic-approx p-values, hypothesis-count-bounded ranking window (multiple testing [ext])",
)
def q_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    cells = cust.groupBy(
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").cast("int").alias("grp"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(bal).alias("s"),
        F.sum(bal * bal).alias("ss"),
    )
    wide = (
        cells.groupBy("c_nationkey")
        .agg(
            F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
            F.max(F.when(F.col("grp") == 1, F.col("s"))).alias("s1"),
            F.max(F.when(F.col("grp") == 1, F.col("ss"))).alias("ss1"),
            F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
            F.max(F.when(F.col("grp") == 0, F.col("s"))).alias("s0"),
            F.max(F.when(F.col("grp") == 0, F.col("ss"))).alias("ss0"),
        )
        .filter((F.col("n1") >= 2) & (F.col("n0") >= 2))
    )
    var1 = (
        F.col("ss1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1")
    ) / (F.col("n1") - 1) / F.col("n1")
    var0 = (
        F.col("ss0").cast("double")
        - F.col("s0").cast("double") * F.col("s0").cast("double") / F.col("n0")
    ) / (F.col("n0") - 1) / F.col("n0")
    z = wide.select(
        "c_nationkey",
        F.round(
            (
                F.col("s1").cast("double") / F.col("n1")
                - F.col("s0").cast("double") / F.col("n0")
            )
            / F.sqrt(var1 + var0),
            8,
        ).alias("z"),
    )
    p = z.withColumn(
        "p_value",
        F.round(
            F.lit(2.0) / (F.lit(1.0) + F.round(F.exp(1.702 * F.abs(F.col("z"))), 10)),
            10,
        ),
    )
    # The ranking window spans m = #hypotheses (<= #nations) rows — a
    # deliberate bounded single-partition window, not a data-sized one.
    w_all = Window.orderBy("p_value", "c_nationkey")
    w_full = Window.partitionBy()
    ranked = p.withColumn("rank", F.row_number().over(w_all)).withColumn(
        "m", F.count(F.lit(1)).over(w_full)
    )
    ranked = ranked.withColumn(
        "bh_threshold", F.round(F.lit(0.10) * F.col("rank") / F.col("m"), 10)
    ).withColumn(
        "k",
        F.max(
            F.when(F.col("p_value") <= F.col("bh_threshold"), F.col("rank")).otherwise(
                0
            )
        ).over(w_full),
    )
    return ranked.select(
        F.col("c_nationkey").cast("long").alias("nationkey"),
        "z",
        "p_value",
        F.col("rank").cast("long").alias("rank"),
        "bh_threshold",
        (F.col("rank") <= F.col("k")).alias("rejected"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Jensen–Shannon divergence between the R-flag and N-flag price-band
# distributions: integer band counts, rounded-addend decimal sums,
# bounded in [0, ln 2].

QJS_ORACLE = """
WITH bands AS (
  SELECT l_returnflag AS flag,
         CAST(floor(l_extendedprice / 500.0) AS BIGINT) AS band
  FROM lineitem
  WHERE l_returnflag IN ('R', 'N') AND l_extendedprice IS NOT NULL
), cnt AS (
  SELECT flag, band, CAST(COUNT(*) AS BIGINT) AS c FROM bands GROUP BY flag, band
), tot AS (
  SELECT flag, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY flag
), wide AS (
  SELECT b.band,
         COALESCE(MAX(CASE WHEN c.flag = 'R' THEN c.c END), 0) AS cr,
         COALESCE(MAX(CASE WHEN c.flag = 'N' THEN c.c END), 0) AS cn
  FROM (SELECT DISTINCT band FROM cnt) b
  LEFT JOIN cnt c USING (band)
  GROUP BY b.band
), probs AS (
  SELECT band,
         CAST(cr AS DOUBLE) / (SELECT t FROM tot WHERE flag = 'R') AS p,
         CAST(cn AS DOUBLE) / (SELECT t FROM tot WHERE flag = 'N') AS q
  FROM wide
), terms AS (
  SELECT band, p, q, (p + q) / 2.0 AS mm,
         CAST(CASE WHEN p > 0
              THEN ROUND(p * ln(p / ((p + q) / 2.0)), 10) ELSE 0 END
              AS DECIMAL(28,12)) AS kp,
         CAST(CASE WHEN q > 0
              THEN ROUND(q * ln(q / ((p + q) / 2.0)), 10) ELSE 0 END
              AS DECIMAL(28,12)) AS kq
  FROM probs
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bands,
       ROUND(CAST(SUM(kp) AS DOUBLE), 6) AS kl_p_m,
       ROUND(CAST(SUM(kq) AS DOUBLE), 6) AS kl_q_m,
       ROUND((CAST(SUM(kp) AS DOUBLE) + CAST(SUM(kq) AS DOUBLE)) / 2.0, 6) AS jsd
FROM terms
"""


@declare(
    "q_jensen_shannon",
    oracle=QJS_ORACLE,
    description="Jensen–Shannon divergence between R-flag and N-flag price-band distributions: integer cells, rounded-addend decimal sums, bounded symmetric divergence in nats (distribution drift [ext])",
)
def q_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): a NULL price has no band —
    # its group would join as an empty USING-band row in the oracle
    li = li.filter(F.col("l_extendedprice").isNotNull())
    bands = li.filter(F.col("l_returnflag").isin("R", "N")).select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") / 500.0).cast("long").alias("band"),
    )
    cnt = bands.groupBy("flag", "band").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cnt = cnt.localCheckpoint(eager=True)  # totals + pivot share this pass
    tot = cnt.groupBy("flag").agg(F.sum("c").cast("long").alias("t"))
    tr = tot.filter(F.col("flag") == "R").select(F.col("t").alias("tr"))
    tn = tot.filter(F.col("flag") == "N").select(F.col("t").alias("tn"))
    wide = cnt.groupBy("band").agg(
        F.coalesce(F.max(F.when(F.col("flag") == "R", F.col("c"))), F.lit(0)).alias(
            "cr"
        ),
        F.coalesce(F.max(F.when(F.col("flag") == "N", F.col("c"))), F.lit(0)).alias(
            "cn"
        ),
    )
    probs = (
        wide.crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tn))
        .select(
            "band",
            (F.col("cr").cast("double") / F.col("tr")).alias("p"),
            (F.col("cn").cast("double") / F.col("tn")).alias("q"),
        )
    )
    mm = (F.col("p") + F.col("q")) / 2.0
    kp = (
        F.when(F.col("p") > 0, F.round(F.col("p") * F.log(F.col("p") / mm), 10))
        .otherwise(0.0)
        .cast("decimal(28,12)")
    )
    kq = (
        F.when(F.col("q") > 0, F.round(F.col("q") * F.log(F.col("q") / mm), 10))
        .otherwise(0.0)
        .cast("decimal(28,12)")
    )
    return probs.agg(
        F.count(F.lit(1)).cast("long").alias("n_bands"),
        F.round(F.sum(kp).cast("double"), 6).alias("kl_p_m"),
        F.round(F.sum(kq).cast("double"), 6).alias("kl_q_m"),
        F.round(
            (F.sum(kp).cast("double") + F.sum(kq).cast("double")) / 2.0, 6
        ).alias("jsd"),
    )


# ---------------------------------------------------------------------------
# Cramér's V over the (orderpriority × orderstatus) contingency table:
# all arithmetic on <= 15 integer cells after one count shuffle.

QCV_ORACLE = """
WITH cells AS (
  SELECT o_orderpriority AS r, o_orderstatus AS c, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY o_orderpriority, o_orderstatus
), rt AS (SELECT r, CAST(SUM(n) AS BIGINT) AS nr FROM cells GROUP BY r),
ct AS (SELECT c, CAST(SUM(n) AS BIGINT) AS nc FROM cells GROUP BY c),
g AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(COUNT(DISTINCT r) AS BIGINT) AS nrows,
             CAST(COUNT(DISTINCT c) AS BIGINT) AS ncols FROM cells),
terms AS (
  SELECT cells.n, rt.nr, ct.nc, g.nn, g.nrows, g.ncols,
         CAST(ROUND(
           POWER(cells.n - CAST(rt.nr AS DOUBLE) * ct.nc / g.nn, 2)
           / (CAST(rt.nr AS DOUBLE) * ct.nc / g.nn), 10) AS DECIMAL(28,12)) AS t
  FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN g
)
SELECT MIN(nn) AS n,
       CAST(MIN((nrows - 1) * (ncols - 1)) AS BIGINT) AS dof,
       ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2,
       ROUND(sqrt(CAST(SUM(t) AS DOUBLE)
                  / (MIN(nn) * (least(MIN(nrows), MIN(ncols)) - 1))), 6)
         AS cramers_v
FROM terms
"""


@declare(
    "q_cramers_v",
    oracle=QCV_ORACLE,
    description="Cramér's V association of orderpriority × orderstatus: chi-square from integer contingency cells (rounded-addend decimal sum), V = sqrt(chi2/(N·(min(r,c)−1))) (categorical association [ext])",
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    cells = orders.groupBy(
        F.col("o_orderpriority").alias("r"), F.col("o_orderstatus").alias("c")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cells = cells.localCheckpoint(eager=True)  # marginals + terms share it
    rt = cells.groupBy("r").agg(F.sum("n").cast("long").alias("nr"))
    ct = cells.groupBy("c").agg(F.sum("n").cast("long").alias("nc"))
    g = cells.agg(
        F.sum("n").cast("long").alias("nn"),
        F.countDistinct("r").cast("long").alias("nrows"),
        F.countDistinct("c").cast("long").alias("ncols"),
    )
    exp = F.col("nr").cast("double") * F.col("nc") / F.col("nn")
    t = F.round(
        F.pow(F.col("n") - exp, 2) / exp,
        10,
    ).cast("decimal(28,12)")
    terms = (
        cells.join(F.broadcast(rt), "r")
        .join(F.broadcast(ct), "c")
        .crossJoin(F.broadcast(g))
    )
    return terms.agg(
        F.min("nn").alias("n"),
        F.min((F.col("nrows") - 1) * (F.col("ncols") - 1)).cast("long").alias("dof"),
        F.round(F.sum(t).cast("double"), 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.sum(t).cast("double")
                / (F.min("nn") * (F.least(F.min("nrows"), F.min("ncols")) - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Brier score + reliability diagram.  Deterministic md5 split on the
# lineitem PK; the "model" is the train-half per-quantity-band return
# rate (rounded to 6 — the prediction is a plan-stable double); test
# rows score against it.  Per-decile-bin mean prediction vs observed
# rate + bin Brier, all from integer/decimal-exact cells.

QBRIER_ORACLE = """
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                              CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS part,
         CAST(l_quantity AS BIGINT) AS band,
         CAST(l_returnflag = 'R' AS INT) AS y
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
    AND l_quantity IS NOT NULL AND l_returnflag IS NOT NULL
), model AS (
  SELECT band, ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS p_hat
  FROM s WHERE part = 0 GROUP BY band
), fallback AS (
  SELECT ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS p_glob
  FROM s WHERE part = 0
), test AS (
  SELECT COALESCE(m.p_hat, f.p_glob) AS p_hat, t.y
  FROM s t LEFT JOIN model m USING (band) CROSS JOIN fallback f
  WHERE t.part = 1
), binned AS (
  SELECT least(CAST(floor(p_hat * 10) AS BIGINT), 9) AS cal_bin, p_hat, y,
         CAST(ROUND((p_hat - y) * (p_hat - y), 10) AS DECIMAL(28,12)) AS sq
  FROM test
)
SELECT cal_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(p_hat AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_pred,
       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS obs_rate,
       ROUND(CAST(SUM(sq) AS DOUBLE) / COUNT(*), 6) AS brier
FROM binned
GROUP BY cal_bin
ORDER BY cal_bin
"""


@declare(
    "q_brier_calibration",
    oracle=QBRIER_ORACLE,
    description="Brier score + reliability diagram: md5 train/test split, per-quantity-band return-rate model, decile calibration bins with mean prediction, observed rate, and bin Brier (ML calibration eval [ext])",
)
def q_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # NULL contract (relational fuzz sweep): split key, band, and label
    # must be defined — concat_ws silently skips a NULL key part where
    # SQL || propagates it, putting the row in different split halves
    li = li.filter(
        F.col("l_orderkey").isNotNull()
        & F.col("l_linenumber").isNotNull()
        & F.col("l_quantity").isNotNull()
        & F.col("l_returnflag").isNotNull()
    )
    # r13 spread-at-the-map (guide §2.5): the per-row md5+conv split
    # key below materializes into the eager pin from the single-row-
    # group scan's ONE partition; the payload is 4 narrow columns, so
    # the exchange is cheap next to the hash compute
    from jibaro_spark.operators.util import ensure_parallelism

    li = ensure_parallelism(
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
        by="l_orderkey",
    )
    part = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    s = li.select(
        part.alias("part"),
        F.col("l_quantity").cast("long").alias("band"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    s = s.localCheckpoint(eager=True)  # model, fallback, and test share it
    train = s.filter(F.col("part") == 0)
    model = train.groupBy("band").agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("p_hat")
    )
    fallback = train.agg(
        F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias("p_glob")
    )
    test = (
        s.filter(F.col("part") == 1)
        .join(F.broadcast(model), "band", "left")
        .crossJoin(F.broadcast(fallback))
        .select(F.coalesce(F.col("p_hat"), F.col("p_glob")).alias("p_hat"), "y")
    )
    binned = test.select(
        F.least(F.floor(F.col("p_hat") * 10).cast("long"), F.lit(9)).alias(
            "cal_bin"
        ),
        "p_hat",
        "y",
        F.round((F.col("p_hat") - F.col("y")) * (F.col("p_hat") - F.col("y")), 10)
        .cast("decimal(28,12)")
        .alias("sq"),
    )
    return (
        binned.groupBy("cal_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.col("p_hat").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_pred"),
            F.round(F.sum("y").cast("double") / F.count(F.lit(1)), 6).alias(
                "obs_rate"
            ),
            F.round(F.sum("sq").cast("double") / F.count(F.lit(1)), 6).alias(
                "brier"
            ),
        )
        .orderBy("cal_bin")
    )


# ---------------------------------------------------------------------------
# Isotonic calibration: the minimax-identity isotonic fit
# (operators/training.isotonic_fit_binned) of the return rate vs the
# quantity bin, per linestatus.  Counts-first: the operator sees one
# row per (linestatus, quantity) — 50 bins — and every interval mean
# is integer/integer double division, exact in both engines.

QISO_ORACLE = """
WITH cells AS (
  SELECT l_linestatus AS linestatus, CAST(l_quantity AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(l_returnflag = 'R' AS INT)) AS BIGINT) AS s
  FROM lineitem GROUP BY l_linestatus, CAST(l_quantity AS BIGINT)
), pref AS (
  SELECT linestatus, bin, n, s,
         SUM(n) OVER (PARTITION BY linestatus ORDER BY bin) AS cn,
         SUM(s) OVER (PARTITION BY linestatus ORDER BY bin) AS cs
  FROM cells
), pairs AS (
  SELECT a.linestatus, a.bin AS j, e.bin AS k,
         CAST(e.cs - (a.cs - a.s) AS DOUBLE)
           / CAST(e.cn - (a.cn - a.n) AS DOUBLE) AS iavg
  FROM pref a JOIN pref e
    ON a.linestatus = e.linestatus AND e.bin >= a.bin
), m AS (
  SELECT linestatus, j, k,
         MIN(iavg) OVER (PARTITION BY linestatus, j ORDER BY k DESC) AS mjk
  FROM pairs
), fit AS (
  SELECT linestatus, k AS bin, MAX(mjk) AS iso FROM m GROUP BY linestatus, k
)
SELECT c.linestatus, c.bin, c.n,
       ROUND(CAST(c.s AS DOUBLE) / c.n, 6) AS raw_rate,
       ROUND(f.iso, 6) AS iso_rate
FROM cells c JOIN fit f USING (linestatus, bin)
ORDER BY linestatus, bin
"""


@declare(
    "q_isotonic_calibration",
    oracle=QISO_ORACLE,
    description="Weighted isotonic regression (minimax-identity distributed PAV) of return rate vs quantity bin per linestatus — the nonparametric model-calibration primitive, O(B²) rows per group with B = bin-domain size (ML calibration [ext])",
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.training import isotonic_fit_binned

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    cells = li.groupBy(
        F.col("l_linestatus").alias("linestatus"),
        F.col("l_quantity").cast("long").alias("bin"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("l_returnflag") == "R").cast("int")).cast("long").alias("s"),
    )
    fit = isotonic_fit_binned(cells, ["linestatus"], "bin", "n", "s")
    return fit.select(
        "linestatus",
        "bin",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("raw_rate"),
        F.round(F.col("iso_fit"), 6).alias("iso_rate"),
    ).orderBy("linestatus", "bin")


# ---------------------------------------------------------------------------
# Simplified silhouette (Hruschka et al.'s centroid-based variant —
# the O(n·k) silhouette every at-scale evaluator uses instead of the
# O(n²) pairwise original): clusters = market segments, feature =
# acctbal in exact integer cents; a = |v − own centroid|, b = min
# over other centroids; s = (b−a)/max(a,b).  Centroids are a 5-row
# broadcast; per-term contributions rounded then decimal-summed.

QSIL_ORACLE = """
WITH pts AS (
  SELECT c_mktsegment AS seg,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS v
  FROM customer
), cent AS (
  SELECT seg, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu FROM pts GROUP BY seg
), scored AS (
  SELECT p.seg, p.v,
         abs(p.v - own.mu) AS a,
         MIN(abs(p.v - oth.mu)) AS b
  FROM pts p
  JOIN cent own ON own.seg = p.seg
  JOIN cent oth ON oth.seg <> p.seg
  GROUP BY p.seg, p.v, own.mu
), sil AS (
  SELECT seg,
         CAST(ROUND(CASE WHEN greatest(a, b) = 0 THEN 0
                         ELSE (b - a) / greatest(a, b) END, 10)
              AS DECIMAL(28,12)) AS s
  FROM scored
)
SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
FROM sil GROUP BY seg ORDER BY seg
"""


@declare(
    "q_silhouette_simplified",
    oracle=QSIL_ORACLE,
    description="Simplified (centroid-based) silhouette of the market-segment clustering over exact-cents acctbal: O(n·k) with a k-row broadcast centroid table, rounded-addend decimal mean per cluster (clustering eval [ext])",
)
def q_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    pts = cust.select(
        F.col("c_mktsegment").alias("seg"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("v"),
    )
    pts = pts.localCheckpoint(eager=True)  # centroids + scoring share it
    cent = pts.groupBy("seg").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    own = cent.select(F.col("seg"), F.col("mu").alias("mu_own"))
    oth = cent.select(F.col("seg").alias("oseg"), F.col("mu").alias("mu_oth"))
    scored = (
        pts.join(F.broadcast(own), "seg")
        .join(F.broadcast(oth), F.col("oseg") != F.col("seg"))
        .groupBy("seg", "v", "mu_own")
        .agg(F.min(F.abs(F.col("v") - F.col("mu_oth"))).alias("b"))
        .withColumn("a", F.abs(F.col("v") - F.col("mu_own")))
    )
    s = (
        F.when(F.greatest("a", "b") == 0, F.lit(0.0))
        .otherwise((F.col("b") - F.col("a")) / F.greatest("a", "b"))
    )
    sil = scored.select(
        "seg", F.round(s, 10).cast("decimal(28,12)").alias("s")
    )
    return (
        sil.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("s").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_silhouette"
            ),
        )
        .orderBy("seg")
    )
