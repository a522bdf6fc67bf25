"""Round-11 declared queries — rank statistics, graph core
decomposition, survival hazard, corpus sentence-level dedup, and
optimizer-style join-size estimation.

Six families, each extending a verified wing:

* ``q_spearman_corr`` — Spearman rank correlation per priority from
  integer "double-ranks" (2× the tie-averaged rank, so every rank is
  an integer) computed counts-first over distinct-value cells; all
  moments are exact integer/decimal sums, doubles only in the final
  formula.
* ``q_kendall_tau`` — Kendall tau-b per priority over a fixed 10×10
  binned grid: concordant/discordant pair counts via 2-D suffix sums
  over the DENSIFIED grid (two window passes — no cell×cell join),
  integer tie corrections, one double sqrt at the end.  The grid is
  fixed-size by construction, so the post-collapse stage costs the
  same at 100 TB as at sf0.001.
* ``q_kcore_peel`` — fixed-round k-core peeling
  (``operators/graph.kcore_peel``) on the customer–supplier graph;
  the oracle unrolls the same rounds in SQL.
* ``q_nelson_aalen`` — cumulative-hazard sibling of
  ``q_kaplan_meier`` over the identical censored time-to-first-
  purchase fixture: H(t) = Σ d/n with terms rounded to 10 and
  decimal-accumulated, plus the Breslow survivor exp(−H).
* ``q_sentence_dedup`` — corpus curation diagnostics at sentence
  grain: per source, exact within-document and cross-document
  duplicate sentence mass from one explode + keyed aggregations.
* ``q_join_size_estimate`` — end-biased-histogram join-cardinality
  estimation (the optimizer/AQE primitive): per returnflag, estimate
  the lineitem self-join size on ``l_partkey`` from the top-20 heavy
  keys (exact) + a uniform-rest assumption, next to the exact
  Σ c_k² — counts-first, top-k via a bounded window over the
  per-key count table.

Cross-engine conventions follow ``queries/registry.py``: integer /
decimal accumulation, doubles only at the output boundary, every
column aliased identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Spearman rank correlation per priority ([ext] stats — the rank
# sibling of the decimal-exact Pearson in round3).  Tie-averaged ranks
# are computed counts-first: collapse to distinct (pr, value) cells,
# one cumulative window over the cell table (≤ #distinct values rows),
# then join the integer "double-rank" 2·r = 2·cum − cnt + 1 back to
# the rows by (pr, value).  Every moment (n, Σr, Σr², Σ r_x·r_y) is an
# exact integer accumulated in DECIMAL(38,0)/HUGEINT; ρ is one double
# expression over those integers.

QSP_ORACLE = """
WITH b AS (
  SELECT o_orderpriority AS pr,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
  FROM orders
), rx AS (
  SELECT pr, x, 2 * SUM(COUNT(*)) OVER (PARTITION BY pr ORDER BY x)
               - COUNT(*) + 1 AS r2
  FROM b GROUP BY pr, x
), ry AS (
  SELECT pr, y, 2 * SUM(COUNT(*)) OVER (PARTITION BY pr ORDER BY y)
               - COUNT(*) + 1 AS r2
  FROM b GROUP BY pr, y
), ranked AS (
  SELECT b.pr, CAST(rx.r2 AS HUGEINT) AS ax, CAST(ry.r2 AS HUGEINT) AS ay
  FROM b JOIN rx ON b.pr = rx.pr AND b.x = rx.x
         JOIN ry ON b.pr = ry.pr AND b.y = ry.y
), m AS (
  SELECT pr, COUNT(*) AS n,
         SUM(ax) AS sx, SUM(ay) AS sy,
         SUM(ax * ax) AS sxx, SUM(ay * ay) AS syy,
         SUM(ax * ay) AS sxy
  FROM ranked GROUP BY pr
)
SELECT pr, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS rho
FROM m ORDER BY pr
"""


@declare(
    "q_spearman_corr",
    oracle=QSP_ORACLE,
    description="Spearman rank correlation (price vs order day) per priority from integer double-ranks over distinct-value cells — exact integer moments, one double formula (stats [ext])",
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    b = o.select(
        F.col("o_orderpriority").alias("pr"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )

    def double_ranks(col: str) -> DataFrame:
        cum = (
            Window.partitionBy("pr")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        # explicit pr-keyed exchange (r12, see dense_exchange): the
        # rank window runs per priority class (5 groups) over ~10^5
        # distinct values and AQE's byte-based coalescing otherwise
        # collapses it below 5 tasks (the q_ks_test pattern)
        from jibaro_spark.operators.util import dense_exchange

        return (
            dense_exchange(
                b.groupBy("pr", col).agg(F.count(F.lit(1)).alias("cnt")), "pr"
            )
            .select(
                "pr",
                col,
                (2 * F.sum("cnt").over(cum) - F.col("cnt") + 1).alias("r2"),
            )
        )

    rx = double_ranks("x").withColumnRenamed("r2", "ax")
    ry = double_ranks("y").withColumnRenamed("r2", "ay")
    ranked = b.join(rx, ["pr", "x"]).join(ry, ["pr", "y"])
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = ranked.groupBy("pr").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d("ax")).alias("sx"),
        F.sum(d("ay")).alias("sy"),
        F.sum(d("ax") * F.col("ax")).alias("sxx"),
        F.sum(d("ay") * F.col("ay")).alias("syy"),
        F.sum(d("ax") * F.col("ay")).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return m.select(
        "pr",
        F.col("n").cast("long").alias("n"),
        F.round(num / (denx * deny), 6).alias("rho"),
    ).orderBy("pr")


# ---------------------------------------------------------------------------
# Kendall tau-b per priority over a fixed 10×10 grid ([ext] stats).
# The row volume collapses map-side to ≤ pr×100 cell counts; the
# densified grid then supports STRICT 2-D suffix/prefix sums with two
# window passes (Σ_{i'>i} per column, then Σ_{j'>j} / Σ_{j'<j} per
# row) — concordant C = Σ n·D, discordant = Σ n·E, no cell×cell join
# anywhere.  Tie corrections n1/n2 come from the marginals; the tau-b
# denominator is one exact integer product cast to double under a
# sqrt.

_DB = "least(greatest((y - 9100) div 280, 0), 9)"  # epoch-day → 0..9
_PB = "least((x * 10) div 60000000, 9)"  # cents → 0..9

QKT_ORACLE = f"""
WITH b AS (
  SELECT o_orderpriority AS pr,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS y
  FROM orders
), cells AS (
  SELECT pr, LEAST((x * 10) // 60000000, 9) AS i,
         LEAST(GREATEST((y - 9100) // 280, 0), 9) AS j,
         COUNT(*) AS cnt
  FROM b GROUP BY 1, 2, 3
), gridbase AS (
  SELECT p.pr, gi.range AS i, gj.range AS j
  FROM (SELECT DISTINCT pr FROM cells) p, range(0, 10) gi, range(0, 10) gj
), grid AS (
  SELECT g.pr, g.i, g.j, COALESCE(c.cnt, 0) AS cnt
  FROM gridbase g LEFT JOIN cells c ON c.pr = g.pr AND c.i = g.i AND c.j = g.j
), s1 AS (
  SELECT pr, i, j, cnt,
         COALESCE(SUM(cnt) OVER (PARTITION BY pr, j ORDER BY i
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS gt_i
  FROM grid
), s2 AS (
  SELECT pr, i, j, cnt,
         COALESCE(SUM(gt_i) OVER (PARTITION BY pr, i ORDER BY j
                  ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS dom,
         COALESCE(SUM(gt_i) OVER (PARTITION BY pr, i ORDER BY j
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS disc
  FROM s1
), cd AS (
  SELECT pr, SUM(cnt * dom) AS c, SUM(cnt * disc) AS d FROM s2 GROUP BY pr
), mx AS (
  SELECT pr, i, SUM(cnt) AS tx FROM grid GROUP BY pr, i
), marg AS (
  SELECT pr, SUM(tx) AS n, SUM(tx * (tx - 1) // 2) AS n1 FROM mx GROUP BY pr
), my AS (
  SELECT pr, j, SUM(cnt) AS ty FROM grid GROUP BY pr, j
), marg2 AS (
  SELECT pr, SUM(ty * (ty - 1) // 2) AS n2 FROM my GROUP BY pr
)
SELECT cd.pr, CAST(m.n AS BIGINT) AS n,
       CAST(cd.c AS BIGINT) AS concordant,
       CAST(cd.d AS BIGINT) AS discordant,
       ROUND(CAST(cd.c - cd.d AS DOUBLE)
             / SQRT(CAST((CAST(m.n AS HUGEINT) * (m.n - 1) / 2 - m.n1)
                         * (CAST(m.n AS HUGEINT) * (m.n - 1) / 2 - m2.n2)
                    AS DOUBLE)), 6) AS tau_b
FROM cd JOIN marg m ON cd.pr = m.pr JOIN marg2 m2 ON cd.pr = m2.pr
ORDER BY cd.pr
"""


@declare(
    "q_kendall_tau",
    oracle=QKT_ORACLE,
    description="Kendall tau-b per priority over a fixed 10x10 binned grid: 2-D suffix-sum concordance counts (no cell-pair join), integer tie corrections (stats [ext])",
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_tables(spark, sf_dir, "orders")["orders"]
    b = o.select(
        F.col("o_orderpriority").alias("pr"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("x"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("y"),
    )
    cells = (
        b.select("pr", F.expr(_PB).alias("i"), F.expr(_DB).alias("j"))
        .groupBy("pr", "i", "j")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = (
        cells.select("pr")
        .distinct()
        .select(
            "pr",
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"),
        )
        .select("pr", "i", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("j"))
        .join(cells, ["pr", "i", "j"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
    )
    w_gt_i = (
        Window.partitionBy("pr", "j")
        .orderBy("i")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    s1 = grid.withColumn("gt_i", F.coalesce(F.sum("cnt").over(w_gt_i), F.lit(0)))
    w_dom = (
        Window.partitionBy("pr", "i")
        .orderBy("j")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    w_disc = (
        Window.partitionBy("pr", "i")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s2 = s1.select(
        "pr",
        "cnt",
        F.coalesce(F.sum("gt_i").over(w_dom), F.lit(0)).alias("dom"),
        F.coalesce(F.sum("gt_i").over(w_disc), F.lit(0)).alias("disc"),
    )
    cd = s2.groupBy("pr").agg(
        F.sum(F.col("cnt") * F.col("dom")).alias("c"),
        F.sum(F.col("cnt") * F.col("disc")).alias("d"),
    )
    tx = grid.groupBy("pr", "i").agg(F.sum("cnt").alias("tx"))
    marg = tx.groupBy("pr").agg(
        F.sum("tx").alias("n"),
        F.sum(F.expr("tx * (tx - 1) div 2")).alias("n1"),
    )
    ty = grid.groupBy("pr", "j").agg(F.sum("cnt").alias("ty"))
    marg2 = ty.groupBy("pr").agg(F.sum(F.expr("ty * (ty - 1) div 2")).alias("n2"))
    n0 = F.expr("cast(n as decimal(38,0)) * (n - 1) / 2").cast("decimal(38,0)")
    joined = cd.join(marg, "pr").join(marg2, "pr")
    return joined.select(
        "pr",
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(
            (F.col("c") - F.col("d")).cast("double")
            / F.sqrt(((n0 - F.col("n1")) * (n0 - F.col("n2"))).cast("double")),
            6,
        ).alias("tau_b"),
    ).orderBy("pr")


# ---------------------------------------------------------------------------
# Fixed-round k-core peeling ([ext] graph, sibling of BFS/SSSP/label-
# propagation) on the supplier CO-PURCHASE graph: suppliers are
# adjacent when they co-appear in the same order at least
# ceil(1.3 × mean-pair-count) times (a data-relative threshold, so the
# graph stays non-degenerate across scale factors).  The node universe
# is ALL suppliers — isolated ones have degree 0 and peel in round 1.
# k=5 over 3 rounds produces a genuine cascade at sf0.01 (kills
# 22→4→4 with a 68-supplier core, measured).  Edge construction is
# linear (per-order supplier pairs, orders are small), the graph is
# supplier²-bounded, and each peel round is one degree agg + two keyed
# anti-joins.  The oracle unrolls the identical rounds.

_KC_K = 5
_KC_R = 3

QKC_ORACLE = f"""
WITH co AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS cnt
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
), st AS (
  SELECT CEIL(1.3 * (SUM(cnt) / COUNT(*))) AS thr FROM co
), e0 AS (
  SELECT u, v FROM co, st WHERE cnt >= thr
), s0 AS (
  SELECT u AS src, v AS dst FROM e0 UNION SELECT v, u FROM e0
), nodes AS (
  SELECT DISTINCT l_suppkey AS n FROM lineitem
), d1 AS (
  SELECT src, COUNT(*) AS deg FROM s0 GROUP BY src
), k1 AS (
  SELECT n FROM nodes LEFT JOIN d1 ON n = src
  WHERE COALESCE(deg, 0) < {_KC_K}
), s1 AS (
  SELECT src, dst FROM s0
  WHERE src NOT IN (SELECT n FROM k1) AND dst NOT IN (SELECT n FROM k1)
), a1 AS (
  SELECT n FROM nodes WHERE n NOT IN (SELECT n FROM k1)
), d2 AS (
  SELECT src, COUNT(*) AS deg FROM s1 GROUP BY src
), k2 AS (
  SELECT n FROM a1 LEFT JOIN d2 ON n = src
  WHERE COALESCE(deg, 0) < {_KC_K}
), s2 AS (
  SELECT src, dst FROM s1
  WHERE src NOT IN (SELECT n FROM k2) AND dst NOT IN (SELECT n FROM k2)
), a2 AS (
  SELECT n FROM a1 WHERE n NOT IN (SELECT n FROM k2)
), d3 AS (
  SELECT src, COUNT(*) AS deg FROM s2 GROUP BY src
), k3 AS (
  SELECT n FROM a2 LEFT JOIN d3 ON n = src
  WHERE COALESCE(deg, 0) < {_KC_K}
), s3 AS (
  SELECT src, dst FROM s2
  WHERE src NOT IN (SELECT n FROM k3) AND dst NOT IN (SELECT n FROM k3)
), a3 AS (
  SELECT n FROM a2 WHERE n NOT IN (SELECT n FROM k3)
), fin AS (
  SELECT src, COUNT(*) AS deg FROM s3 GROUP BY src
)
SELECT nodes.n AS suppkey,
       CAST(CASE WHEN nodes.n IN (SELECT n FROM k1) THEN 1
                 WHEN nodes.n IN (SELECT n FROM k2) THEN 2
                 WHEN nodes.n IN (SELECT n FROM k3) THEN 3
            END AS BIGINT) AS peeled_round,
       CAST(CASE WHEN nodes.n IN (SELECT n FROM a3)
                 THEN COALESCE(f.deg, 0) END AS BIGINT) AS deg
FROM nodes LEFT JOIN fin f ON nodes.n = f.src
ORDER BY suppkey
"""


@declare(
    "q_kcore_peel",
    oracle=QKC_ORACLE,
    description=f"Fixed-round k-core peeling (k={_KC_K}, {_KC_R} rounds) on the supplier co-purchase graph (mean-relative edge threshold, isolated nodes peel at degree 0) — oracle unrolls the rounds (graph [ext])",
)
def q_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.graph import kcore_peel

    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("v"))
    co = (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    st = co.agg(
        F.ceil(1.3 * (F.sum("cnt") / F.count(F.lit(1)))).alias("thr")
    )
    edges = co.crossJoin(F.broadcast(st)).filter(F.col("cnt") >= F.col("thr"))
    suppliers = li.select(F.col("l_suppkey").alias("n")).distinct()
    res = kcore_peel(edges, k=_KC_K, rounds=_KC_R, src="u", dst="v", nodes=suppliers)
    return res.select(
        F.col("node").cast("long").alias("suppkey"), "peeled_round", "deg"
    ).orderBy("suppkey")


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard ([ext] survival — the hazard-side
# sibling of q_kaplan_meier over the IDENTICAL censored
# time-to-first-purchase fixture, round6d.py).  H(t) = Σ_{s≤t} d_s/n_s
# with each term rounded to 10 and accumulated in decimal so both
# engines sum identical addends; the Breslow survivor exp(−H) rides
# along.  Same 100 TB shape as KM: one narrow per-user aggregate, then
# windows over the ≤73-row duration table.

QNA_ORACLE = """
WITH first_ev AS (
  SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
), first_buy AS (
  SELECT user_id, MIN(ts) AS tp FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
), raw AS (
  SELECT (epoch_us(p.tp) - epoch_us(f.t0)) // 3600000000 AS h
  FROM first_ev f LEFT JOIN first_buy p USING (user_id)
), lifetimes AS (
  SELECT CASE WHEN h IS NOT NULL AND h <= 72 THEN h ELSE 72 END AS dur,
         CASE WHEN h IS NOT NULL AND h <= 72 THEN 0 ELSE 1 END AS censored
  FROM raw
), by_dur AS (
  SELECT dur, SUM(1 - censored) AS d, COUNT(*) AS leaving
  FROM lifetimes GROUP BY dur
), at_risk AS (
  SELECT dur, d, SUM(leaving) OVER (ORDER BY dur DESC) AS n
  FROM by_dur
), terms AS (
  SELECT dur, d, n,
         CAST(ROUND(d / CAST(n AS DOUBLE), 10) AS DECIMAL(18,12)) AS term
  FROM at_risk WHERE d > 0
)
SELECT dur, CAST(d AS BIGINT) AS d, CAST(n AS BIGINT) AS n,
       ROUND(CAST(SUM(term) OVER (ORDER BY dur) AS DOUBLE), 6) AS cum_hazard,
       ROUND(EXP(-CAST(SUM(term) OVER (ORDER BY dur) AS DOUBLE)), 6) AS breslow_survival
FROM terms
ORDER BY dur
"""


@declare(
    "q_nelson_aalen",
    oracle=QNA_ORACLE,
    description="Nelson-Aalen cumulative hazard + Breslow survivor over the censored time-to-first-purchase fixture — decimal-accumulated rounded hazard terms (survival [ext])",
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    first_ev = events.groupBy("user_id").agg(F.min("ts").alias("t0"))
    first_buy = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    h = F.expr("(unix_micros(tp) - unix_micros(t0)) div 3600000000")
    observed = h.isNotNull() & (h <= 72)
    lifetimes = first_ev.join(first_buy, "user_id", "left").select(
        F.when(observed, h).otherwise(F.lit(72)).alias("dur"),
        F.when(observed, F.lit(0)).otherwise(F.lit(1)).alias("censored"),
    )
    by_dur = lifetimes.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("censored")).alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    # windows run over the ≤73-row duration table, not the event volume
    w_desc = Window.orderBy(F.col("dur").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    at_risk = by_dur.withColumn("n", F.sum("leaving").over(w_desc)).filter(
        F.col("d") > 0
    )
    term = F.round(F.col("d") / F.col("n").cast("double"), 10).cast("decimal(18,12)")
    w_asc = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum("term").over(w_asc).cast("double")
    return (
        at_risk.withColumn("term", term)
        .select(
            "dur",
            F.col("d").cast("long").alias("d"),
            F.col("n").cast("long").alias("n"),
            F.round(cum, 6).alias("cum_hazard"),
            F.round(F.exp(-cum), 6).alias("breslow_survival"),
        )
        .orderBy("dur")
    )


# ---------------------------------------------------------------------------
# Sentence-grain corpus dedup diagnostics ([ext] text curation — the
# sub-document sibling of the document-level exact/near dedup wing).
# One explode to (source, doc_id, normalized sentence), then keyed
# aggregations only: within-document duplicate mass (repeated
# sentences inside one doc — boilerplate), cross-document duplicate
# sentences (sentences appearing in ≥ 2 docs of the source —
# template/licence text), and the unique-sentence ratio.  At 100 TB
# everything after the explode is a pair of groupBys on
# (source[, sentence]) — map-side combinable, no joins, no windows.

QSD_ORACLE = """
WITH sents AS (
  SELECT source, doc_id, trim(lower(s)) AS sent
  FROM documents, unnest(string_split(text, '. ')) AS u(s)
  WHERE length(trim(lower(s))) >= 20
), per_sent AS (
  SELECT source, sent, COUNT(*) AS n_occ,
         COUNT(DISTINCT doc_id) AS n_docs
  FROM sents GROUP BY source, sent
)
SELECT source,
       CAST(SUM(n_occ) AS BIGINT) AS n_sents,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(n_occ - n_docs) AS BIGINT) AS within_doc_dup,
       CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS cross_doc_sents,
       ROUND(1 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(n_occ) AS DOUBLE), 6)
         AS dup_ratio
FROM per_sent
GROUP BY source
ORDER BY source
"""


@declare(
    "q_sentence_dedup",
    oracle=QSD_ORACLE,
    description="Sentence-grain dedup diagnostics per source: within-doc duplicate mass, cross-doc template sentences, unique ratio — one explode + keyed aggs, no joins (text curation [ext])",
)
def q_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    sents = docs.select(
        "source",
        "doc_id",
        F.explode(F.split(F.col("text"), r"\. ")).alias("s"),
    ).select(
        "source", "doc_id", F.trim(F.lower(F.col("s"))).alias("sent")
    ).filter(F.length("sent") >= 20)
    per_sent = sents.groupBy("source", "sent").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        per_sent.groupBy("source")
        .agg(
            F.sum("n_occ").cast("long").alias("n_sents"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
            F.sum(F.col("n_occ") - F.col("n_docs")).cast("long").alias("within_doc_dup"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("cross_doc_sents"),
            F.round(
                F.lit(1)
                - F.count(F.lit(1)).cast("double") / F.sum("n_occ").cast("double"),
                6,
            ).alias("dup_ratio"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# End-biased-histogram join-size estimation ([ext] — the optimizer /
# AQE primitive behind skew-aware planning; companion to the round-5
# salted-join skew diagnostics).  Per returnflag, the lineitem
# self-join size on l_partkey is estimated from the top-20 heavy keys
# (exact counts) plus a uniform assumption on the remainder, and
# compared to the exact Σ c_k².  Counts-first: the per-key count
# table is the only input to both lanes; top-20 is a bounded window
# over it (at 100 TB: TakeOrdered per flag), the rest is two global
# sums.  All integer until the final division.

QJS_ORACLE = """
WITH c AS (
  SELECT l_returnflag AS flag, l_partkey AS k, COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT flag, k, cnt,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY cnt DESC, k) AS rk
  FROM c
), agg AS (
  SELECT flag,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS exact_pairs,
         SUM(CASE WHEN rk <= 20 THEN CAST(cnt AS HUGEINT) * cnt ELSE 0 END)
           AS top_pairs,
         SUM(CASE WHEN rk > 20 THEN cnt ELSE 0 END) AS rest_tot,
         SUM(CASE WHEN rk > 20 THEN 1 ELSE 0 END) AS rest_keys
  FROM ranked GROUP BY flag
)
SELECT flag,
       CAST(exact_pairs AS BIGINT) AS exact_pairs,
       ROUND(CAST(top_pairs AS DOUBLE)
             + CASE WHEN rest_keys > 0
                    THEN CAST(CAST(rest_tot AS HUGEINT) * rest_tot AS DOUBLE)
                         / CAST(rest_keys AS DOUBLE)
                    ELSE 0 END, 4) AS est_pairs,
       ROUND((CAST(top_pairs AS DOUBLE)
              + CASE WHEN rest_keys > 0
                     THEN CAST(CAST(rest_tot AS HUGEINT) * rest_tot AS DOUBLE)
                          / CAST(rest_keys AS DOUBLE)
                     ELSE 0 END
              - CAST(exact_pairs AS DOUBLE))
             / CAST(exact_pairs AS DOUBLE) * 100, 6) AS rel_err_pct
FROM agg ORDER BY flag
"""


@declare(
    "q_join_size_estimate",
    oracle=QJS_ORACLE,
    description="End-biased-histogram join-cardinality estimation per returnflag: top-20 heavy keys exact + uniform rest vs the exact self-join size on l_partkey (optimizer/AQE [ext])",
)
def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    c = li.groupBy(
        F.col("l_returnflag").alias("flag"), F.col("l_partkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    rk_w = Window.partitionBy("flag").orderBy(F.col("cnt").desc(), "k")
    ranked = c.withColumn("rk", F.row_number().over(rk_w))
    d = F.col("cnt").cast("decimal(38,0)")
    agg = ranked.groupBy("flag").agg(
        F.sum(d * F.col("cnt")).alias("exact_pairs"),
        F.sum(F.when(F.col("rk") <= 20, d * F.col("cnt")).otherwise(F.lit(0))).alias(
            "top_pairs"
        ),
        F.sum(F.when(F.col("rk") > 20, F.col("cnt")).otherwise(F.lit(0))).alias(
            "rest_tot"
        ),
        F.sum(F.when(F.col("rk") > 20, 1).otherwise(0)).alias("rest_keys"),
    )
    est_rest = F.when(
        F.col("rest_keys") > 0,
        (F.col("rest_tot").cast("decimal(38,0)") * F.col("rest_tot")).cast("double")
        / F.col("rest_keys").cast("double"),
    ).otherwise(F.lit(0.0))
    est = F.col("top_pairs").cast("double") + est_rest
    return agg.select(
        "flag",
        F.col("exact_pairs").cast("long").alias("exact_pairs"),
        F.round(est, 4).alias("est_pairs"),
        F.round(
            (est - F.col("exact_pairs").cast("double"))
            / F.col("exact_pairs").cast("double")
            * 100,
            6,
        ).alias("rel_err_pct"),
    ).orderBy("flag")
