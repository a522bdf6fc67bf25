"""Round-4 declared queries: bucketed co-located joins, sliding
windows, and mergeable frequency sketches ([ext] — Spark-native scale
machinery the reference engine lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


def _d(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# Bucketed co-located join: both sides written bucketBy(orderkey) once,
# then the join/agg runs WITHOUT any Exchange (the plan assertion lives
# in tests/test_scale_plans.py).  Result values are oracle-checked —
# bucketing must change the plan, never the answer.
QBUCKJOIN_ORACLE = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@declare(
    "q_bucketed_join",
    oracle=QBUCKJOIN_ORACLE,
    description="shuffle-free co-located join over same-bucketed tables — write-once shuffle amortized over every key-aligned consumer (bucketing [ext])",
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.io import write_bucketed_table

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    write_bucketed_table(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        "jb_bucketed_orders",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed_table(
        t["lineitem"]
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
        "jb_bucketed_lineitem",
        ["o_orderkey"],
        num_buckets=8,
        sort_cols=["o_orderkey"],
    )
    revenue = _d("l_extendedprice") * (F.lit(1) - _d("l_discount"))
    return (
        spark.table("jb_bucketed_orders")
        .join(spark.table("jb_bucketed_lineitem"), ["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Sliding (hopping) windows: 30-minute windows every 10 minutes via
# F.window(ts, "30 minutes", "10 minutes") — each event lands in 3
# windows.  The batch form of the streaming hopping aggregation (same
# expression under readStream + watermark); the DuckDB oracle unrolls
# the 3 hops explicitly.
QSLIDE_ORACLE = """
WITH hops AS (
  SELECT e.user_id, e.value,
         CAST(to_timestamp(floor(epoch(CAST(e.ts AS TIMESTAMP)) / 600) * 600
                           - h.off * 600) AS TIMESTAMP) AS w_start
  FROM events e, (SELECT UNNEST(range(3)) AS off) h
  WHERE e.ts IS NOT NULL
    AND floor(epoch(CAST(e.ts AS TIMESTAMP)) / 600) * 600 - h.off * 600
        + 1800 > epoch(CAST(e.ts AS TIMESTAMP))
)
SELECT w_start, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM hops
GROUP BY w_start
ORDER BY w_start
"""


@declare(
    "q_sliding_windows",
    oracle=QSLIDE_ORACLE,
    description="hopping-window aggregation (30 min window, 10 min slide) — batch form of the streaming hop (T5 [ext])",
)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL pinned EXPLICITLY on both sides: Spark groups
    # null-ts rows into a null window struct while the oracle's
    # hop-unroll WHERE drops them — without the filter the equivalence
    # holds only while the fixture has no null timestamps (ADVICE r4).
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull()
    )
    return (
        ev.groupBy(F.window("ts", "30 minutes", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.sum(_d("value")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("w_start"), "n_events", "n_users", "sum_value")
        .orderBy("w_start")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters: a MERGEABLE frequency sketch (depth×
# width counters, per-partition partial sketches combine by cell-wise
# sum — the property that makes it a distributed/streaming-rollup
# citizen, same family as the HLL/KMV queries).  CMS guarantees
# estimate ≥ true count (one-sided error ≤ εN w.h.p.), so top-k by
# estimate never misses a true heavy hitter above the error band.
# Built from native exprs only: the d hash rows are xxhash64(term, d),
# the sketch is a groupBy over (row, col) cells.  Declared rows-only
# (the sketch itself is engine-specific); tests/test_approx_ops.py
# pins estimate ≥ exact and bounded overestimate on the fixtures, and
# tests/test_round5_sketches.py pins the merge law.  The sketch/merge/
# lookup operators live in jibaro_spark.operators.sketches (promoted
# per VERDICT r4 §Next-7).


# ---------------------------------------------------------------------------
# Snapshot diff: row-level added/removed/changed audit between two
# versions of a table (operators/cdc.snapshot_diff).  Versions are
# derived deterministically from the orders fixture: v2 drops every
# 7th order, adds nothing, and reprices every 5th — so all three
# statuses appear with known counts.  Output is change-sized, never
# table-sized.
QSNAPDIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
  WHERE o_orderkey % 7 <> 0
), new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0
              THEN CAST(ROUND(o_totalprice * 1.1, 2) AS DOUBLE)
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders
), j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'added'
              WHEN n.o_orderkey IS NULL THEN 'removed'
              WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                   OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                   OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                THEN 'changed' END AS status,
         CASE WHEN o.o_orderkey IS NULL OR n.o_orderkey IS NULL THEN ''
              ELSE array_to_string(list_filter(
                [CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus THEN 'o_orderstatus' END,
                 CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'o_totalprice' END,
                 CASE WHEN o.o_orderpriority IS DISTINCT FROM n.o_orderpriority THEN 'o_orderpriority' END],
                x -> x IS NOT NULL), ',') END AS changed_cols
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey, status, changed_cols FROM j WHERE status IS NOT NULL
ORDER BY o_orderkey
"""


@declare(
    "q_snapshot_diff",
    oracle=QSNAPDIFF_ORACLE,
    description="row-level snapshot diff: added/removed/changed + column change sets between table versions (CDC audit [ext])",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.cdc import snapshot_diff

    orders = load_tables(spark, sf_dir, "orders")["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0,
            F.round(F.col("o_totalprice") * 1.1, 2).cast("double"),
        ).otherwise(F.col("o_totalprice")),
    )
    return (
        snapshot_diff(old, new, ["o_orderkey"])
        .withColumn("changed_cols", F.concat_ws(",", "changed_cols"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Bigram-LM perplexity: train an add-1-smoothed bigram language model
# on the corpus and score every document's perplexity — the
# CCNet-style LM quality filter (documents far from the corpus
# distribution score high).  Per-bigram log probs are rounded to 10dp
# and decimal-summed (the PMI/entropy determinism recipe); the final
# exp is taken on the rounded mean.  Shuffles: bigram counts (grows
# with corpus — joined, never broadcast) + the per-doc rollup.
QBPPL_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_TOKS} AS ts FROM documents
), uc AS (
  SELECT term, COUNT(*) AS c FROM (SELECT unnest(ts) AS term FROM d) GROUP BY term
), v AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS vsize FROM uc
), big AS (
  SELECT doc_id,
         unnest(list_slice(ts, 1, len(ts) - 1)) AS t1,
         unnest(list_slice(ts, 2, len(ts))) AS t2
  FROM d
  WHERE len(ts) >= 2
), bc AS (
  SELECT t1, t2, COUNT(*) AS c_xy FROM big GROUP BY t1, t2
), scored AS (
  SELECT b.doc_id,
         ROUND(LN((CAST(bc.c_xy AS DOUBLE) + 1.0)
                  / (CAST(u1.c AS DOUBLE) + v.vsize)), 10) AS lp
  FROM big b
  JOIN bc ON b.t1 = bc.t1 AND b.t2 = bc.t2
  JOIN uc u1 ON b.t1 = u1.term
  CROSS JOIN v
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(EXP(-(CAST(SUM(CAST(lp AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*))), 6)
         AS perplexity
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@declare(
    "q_bigram_perplexity",
    oracle=QBPPL_ORACLE,
    description="add-1 bigram LM perplexity per document — the LM quality-filter signal (curation [ext])",
)
def q_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # tokenization (interpreted HOF) feeds the unigram counts AND the
    # bigram expansion, whose consumers shuffle on DIFFERENT keys (term
    # vs (t1,t2)) — materialize the token arrays once (same reuse
    # discipline as the cross-doc shingle query).  The bigram explode
    # itself is NOT checkpointed: its two consumers both exchange on
    # (t1,t2), which Catalyst already reuses, and at 100 TB
    # materializing the bigram table would cost more than the reuse.
    d = docs.select("doc_id", tokens(F.col("text")).alias("ts")).localCheckpoint(
        eager=True
    )
    uc = (
        d.select(F.explode("ts").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    v = uc.agg(F.count(F.lit(1)).cast("double").alias("vsize"))
    n1 = F.size("ts") - 1
    big = (
        d.filter(F.size("ts") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("ts", F.lit(1), n1).alias("t1"),
                    F.slice("ts", F.lit(2), n1).alias("t2"),
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
    )
    bc = big.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c_xy"))
    u1 = uc.select(F.col("term").alias("t1"), F.col("c").alias("c1"))
    lp = F.round(
        F.log(
            (F.col("c_xy").cast("double") + F.lit(1.0))
            / (F.col("c1").cast("double") + F.col("vsize"))
        ),
        10,
    )
    scored = (
        big.join(bc, ["t1", "t2"])
        .join(u1, "t1")
        .crossJoin(F.broadcast(v))
        .select("doc_id", lp.alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(
                    -(
                        F.sum(F.col("lp").cast("decimal(28,10)")).cast("double")
                        / F.count(F.lit(1))
                    )
                ),
                6,
            ).alias("perplexity"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Quality-model inference: a fixed logistic model over the quality
# features — the model-scoring step of a curation pipeline (classifier
# weights broadcast as literals, score entirely map-side; at 100 TB
# this is one scan, zero shuffles before the tiny band rollup).  The
# linear term is rounded to 6dp BEFORE the sigmoid and the probability
# to 6dp after, the same transcendental-determinism recipe the
# PMI/entropy queries use.
QQMODEL_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang,
         CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
         CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
           / CAST(LENGTH(text) AS DOUBLE) AS punct_ratio,
         CAST(len(list_distinct({{toks}})) AS DOUBLE) / CAST(len({{toks}}) AS DOUBLE)
           AS uniq_token_ratio,
         CAST(len({{toks}}) AS DOUBLE) AS n_tok
  FROM documents
), z AS (
  SELECT doc_id, lang,
         ROUND(-1.5 + 2.0 * alpha_ratio + 1.2 * uniq_token_ratio
               - 3.0 * punct_ratio + 0.002 * n_tok, 6) AS z
  FROM f
), p AS (
  SELECT doc_id, lang, ROUND(1.0 / (1.0 + EXP(-z)), 6) AS p FROM z
)
SELECT lang,
       CASE WHEN p >= 0.75 THEN 'high' WHEN p >= 0.5 THEN 'mid' ELSE 'low' END AS band,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) AS sum_p
FROM p
GROUP BY lang, band
ORDER BY lang, band
""".replace("{toks}", "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')")


@declare(
    "q_quality_model_score",
    oracle=QQMODEL_ORACLE,
    description="logistic quality-model inference: broadcast-literal weights, map-side sigmoid scoring, per-lang band rollup (curation [ext])",
)
def q_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import quality_features

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    f = quality_features(F.col("text"))
    z = F.round(
        F.lit(-1.5)
        + F.lit(2.0) * f["alpha_ratio"]
        + F.lit(1.2) * f["uniq_token_ratio"]
        - F.lit(3.0) * f["punct_ratio"]
        + F.lit(0.002) * f["n_tokens"].cast("double"),
        6,
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    band = (
        F.when(p >= 0.75, "high").when(p >= 0.5, "mid").otherwise("low")
    )
    return (
        docs.select("lang", p.alias("__p"), band.alias("band"))
        .groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("__p").cast("decimal(18,6)")).cast("double").alias("sum_p"),
        )
        .orderBy("lang", "band")
    )


# ---------------------------------------------------------------------------
# BPE vocabulary training: iterative most-frequent-pair merges over the
# word-frequency table (operators/bpe.py — the corpus is touched once
# for the word count; every round is vocab-sized).  Non-SQL-expressible
# (argmax-dependent iterative rewrite) → rows-only for the driver,
# exact-pinned against a pure-Python reference BPE in pytest.


@declare(
    "q_bpe_train",
    oracle=None,
    description="BPE tokenizer training: iterative adjacent-pair merges over the word-frequency table (tokenizer [ext])",
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.bpe import bpe_train
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    wc = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .count()
    )
    merges = bpe_train(wc, "w", "count", num_merges=12)
    return spark.createDataFrame(
        merges, "round int, left string, right string, freq long"
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup regime): the corpus is the embeddings table
# plus DETERMINISTIC planted replicas (every 5th vector re-appears at
# id+100000; every 10th also at id+200000 — the re-crawled/mirrored
# document case), near-dup pairs at the high SemDeDup threshold are
# found by the CELL-PARTITIONED exact kernel (assign to coarse cell →
# exact matmul within cell: sub-quadratic, and provably exact-recall
# for replica pairs at ANY scale since identical vectors share their
# home cell), then connected components → canonical keep-rows.  The
# oracle recomputes the pairs with exact SQL cosine over the same
# planted corpus and closes them with a recursive CTE — natural
# (non-replica) pairs cannot reach 0.92 in the fixtures (max natural
# cosine ≈ 0.60), so the oracle's all-pairs scan and the engine's
# cell-pruned scan provably agree.  VERDICT r4 §wrong #1: the previous
# form of this query fed the full corpus through the all-pairs kernel
# at threshold 0.45 — a threshold below the prunable regime where
# exact dedup is intrinsically quadratic (that exact low-threshold
# path remains covered by q_embedding_near_dup and stays the
# verification oracle in tests/test_round5_semdedup.py).
QSEMDUP_ORACLE = """
WITH RECURSIVE fin AS (
  -- a vector with a NaN/Inf component is not a valid embedding (float
  -- fuzz sweep): its NaN cosine passes DuckDB's NaN-largest >= filter
  -- but fails numpy's; a NULL component likewise invalidates the
  -- vector (NULL contract: Spark's ~exists fence yields NULL under
  -- three-valued logic and drops it, so the lambda must be NULL-aware)
  SELECT * FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0
), corpus AS (
  SELECT vec_id, embedding FROM fin
  UNION ALL
  SELECT vec_id + 100000 AS vec_id, embedding FROM fin WHERE vec_id % 5 = 0
  UNION ALL
  SELECT vec_id + 200000 AS vec_id, embedding FROM fin WHERE vec_id % 10 = 0
), grp AS (
  -- exact-duplicate collapse FIRST (skew class r10): identical vectors
  -- have cosine exactly 1 and share their home cell, so the pair scan
  -- and the closure run once per DISTINCT vector; members inherit the
  -- representative's cluster.  rep = MIN vec_id of its group, so
  -- component minima (= cluster ids) are unchanged.
  SELECT embedding, MIN(vec_id) AS rep FROM corpus GROUP BY embedding
), pr AS (
  SELECT id_a, id_b FROM (
    SELECT a.rep AS id_a, b.rep AS id_b,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)
             AS cosine_sim
    FROM grp a, grp b
    WHERE a.rep < b.rep
  ) WHERE cosine_sim >= 0.92
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pr
  UNION
  SELECT id_b AS a, id_a AS b FROM pr
), reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
), comp AS (
  SELECT src AS vid, MIN(dst) AS cid FROM reach GROUP BY src
), mapped AS (
  SELECT v.vec_id, COALESCE(c.cid, g.rep) AS cluster_id
  FROM corpus v
  JOIN grp g ON g.embedding = v.embedding
  LEFT JOIN comp c ON g.rep = c.vid
)
SELECT vec_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       (vec_id = cluster_id) AS keep
FROM mapped
ORDER BY vec_id
"""


def _planted_corpus(emb):
    """embeddings ∪ deterministic replicas: every 5th vector at
    id+100000, every 10th also at id+200000 (clusters of size 2 and 3
    with the original id as the canonical minimum)."""
    return (
        emb.select("vec_id", "embedding")
        .unionByName(
            emb.filter(F.col("vec_id") % 5 == 0).select(
                (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
            )
        )
        .unionByName(
            emb.filter(F.col("vec_id") % 10 == 0).select(
                (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
            )
        )
    )


@declare(
    "q_embedding_dedup_clusters",
    oracle=QSEMDUP_ORACLE,
    description="semantic dedup, SemDeDup-style: cell-partitioned exact near-dup pairs over a replica-planted corpus → connected components → canonical keep flags (dedup [ext])",
)
def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jibaro_spark.operators.graph import dedup_clusters
    from jibaro_spark.operators.similarity import (
        embedding_near_duplicates_cells,
        seed_centroids,
    )

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # finite-vector fence, mirrored in the oracle (float fuzz sweep);
    # materialized once — the three corpus branches and seed_centroids
    # would otherwise each re-evaluate the 64-element HOF scan
    # (measured 3.9 → 3.2 s warm at sf0.1)
    emb = emb.filter(
        ~F.exists(
            "embedding",
            lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
        )
    ).localCheckpoint(eager=True)
    corpus = _planted_corpus(emb)
    # codebook = strided seeds from the BASE table (dense ids → no
    # fallback pass).  The production shape is train-once / pass-in, so
    # the per-run cost this query models is assignment + within-cell
    # kernels — NOT codebook training; replica recall is exact for ANY
    # centroid choice (identical vectors share their nearest cell), and
    # Lloyd refinement of the codebook is exercised on its own in
    # q_kmeans_assign / the IVF family.  Dropping the inline refine
    # iteration cut ~1.3 s/run at sf0.1 with an identical oracle hash.
    cents = seed_centroids(emb, "vec_id", "embedding", 8)
    # exact-duplicate collapse FIRST (skew class r10, mirrored in the
    # oracle): the cell kernels and connected components run once per
    # DISTINCT vector — a vector duplicated to 50% of the corpus
    # otherwise makes the within-cell matmul and the oracle closure
    # quadratic in its copy count.  rep = group min vec_id, so
    # component minima (= cluster ids) are unchanged.
    groups = corpus.groupBy("embedding").agg(F.min("vec_id").alias("__rep"))
    members = corpus.join(groups, "embedding").select("vec_id", "__rep")
    reps = corpus.join(
        groups.select(F.col("__rep").alias("vec_id")), "vec_id"
    )
    pairs = embedding_near_duplicates_cells(
        reps, "vec_id", "embedding", threshold=0.92, centroids=cents, n_probe=1
    )
    rep_clusters = dedup_clusters(
        reps.select("vec_id"), pairs.select("id_a", "id_b"), "vec_id"
    )
    clustered = members.join(
        rep_clusters.select(
            F.col("vec_id").alias("__rep"), F.col("cluster_id")
        ),
        "__rep",
    ).select("vec_id", "cluster_id")
    return (
        clustered.withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")).cast("long"),
        )
        .withColumn("keep", F.col("vec_id") == F.col("cluster_id"))
        .select("vec_id", "cluster_id", "cluster_size", "keep")
        .orderBy("vec_id")
    )


@declare(
    "q_cms_heavy_hitters",
    oracle=None,  # sketch estimates are engine-specific; accuracy pinned in pytest
    description="count-min sketch heavy hitters — mergeable depth×width counter sketch, estimate ≥ truth (sketch family [ext])",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sketches import cms_estimates
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    return (
        cms_estimates(terms, "term", depth=4, width=1024)
        .orderBy(F.col("est").desc(), "term")
        .limit(25)
    )
