"""Round-14 declared queries — sorted-neighborhood ER blocking,
readability scoring, multilingual byte diagnostics, l-diversity, and
deterministic cross-validation.

* ``q_sorted_neighborhood`` — sorted-neighborhood blocking
  (``operators/dedup.sorted_neighborhood_pairs``): candidate pairs
  within ``w`` rank positions under a name sort, ranked WITHOUT a
  single-partition window (global_row_number) and paired via two
  adjacent-bucket equi-joins; the oracle replays it with a plain
  ROW_NUMBER + rank-distance self-join.
* ``q_readability`` — Flesch reading-ease per source from integer
  totals: words (token count), sentences ('. ' splits), and a
  vowel-group syllable proxy via ``regexp_extract_all`` — the
  quality-filter signal next to the length/punct/stopword scorer.
* ``q_utf8_stats`` — bytes-vs-chars diagnostics per lang (UTF-8
  expansion, non-ASCII doc share) from ``octet_length``/``length`` —
  the encoding sanity pass any multilingual 100 TB corpus needs.
* ``q_l_diversity`` — l-diversity per (mktsegment, nation) QI group
  (distinct sensitive acctbal bands), the companion audit to
  q_k_anonymity.
* ``q_cv_folds`` — 5-fold deterministic (md5) cross-validation of the
  integer-exact English heuristic vs the lang label: per-fold
  accuracy from pure integer cells.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking over customer names ([ext] entity
# resolution).  w = 5.

_SN_W = 5

QSN_ORACLE = f"""
WITH ranked AS (
  SELECT c_custkey,
         ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS rn
  FROM customer
  WHERE c_name IS NOT NULL AND c_custkey IS NOT NULL
)
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(b.rn - a.rn AS BIGINT) AS rank_dist
FROM ranked a JOIN ranked b
  ON b.rn > a.rn AND b.rn - a.rn <= {_SN_W}
ORDER BY id_a, id_b
"""


@declare(
    "q_sorted_neighborhood",
    oracle=QSN_ORACLE,
    description=f"Sorted-neighborhood ER blocking (w={_SN_W}) over customer names: distributed global rank + adjacent-bucket pair joins, no single-partition window (entity resolution [ext])",
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import sorted_neighborhood_pairs

    c = load_tables(spark, sf_dir, "customer")["customer"]
    # NULL contract (relational fuzz sweep): the sort key must be
    # defined — a NULL name sorts to opposite ends of the two engines'
    # global rank and shifts every window-w neighborhood
    c = c.filter(F.col("c_name").isNotNull() & F.col("c_custkey").isNotNull())
    pairs = sorted_neighborhood_pairs(
        c.select(F.col("c_custkey"), "c_name"), "c_custkey", ["c_name"], _SN_W
    )
    return pairs.select(
        F.col("id_a"),
        F.col("id_b"),
        F.col("rank_dist").cast("long").alias("rank_dist"),
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Flesch reading ease per source ([ext] text quality).  All three
# inputs are integer counts aggregated map-side; the score is one
# double expression over exact totals.  Syllables ≈ vowel groups
# ([aeiouy]+ runs) — the standard cheap proxy.

QRD_ORACLE = """
WITH d AS (
  SELECT source,
         len(list_filter(string_split(trim(lower(text)), ' '), t -> t <> ''))
           AS words,
         len(list_filter(string_split(text, '. '), s -> length(trim(s)) > 0))
           AS sents,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syls
  FROM documents
), t AS (
  SELECT source, SUM(words) AS w, SUM(sents) AS s, SUM(syls) AS y, COUNT(*) AS nd
  FROM d GROUP BY source
)
SELECT source, CAST(nd AS BIGINT) AS n_docs,
       CAST(w AS BIGINT) AS words, CAST(s AS BIGINT) AS sentences,
       CAST(y AS BIGINT) AS syllables,
       ROUND(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
             - 84.6 * (CAST(y AS DOUBLE) / w), 6) AS flesch
FROM t ORDER BY source
"""


@declare(
    "q_readability",
    oracle=QRD_ORACLE,
    description="Flesch reading-ease per source from integer word/sentence/vowel-group totals (regexp_extract_all syllable proxy) — the readability quality-filter signal (text quality [ext])",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    words = F.size(
        F.filter(
            F.split(F.trim(F.lower(F.col("text"))), " "), lambda t: t != ""
        )
    )
    sents = F.size(
        F.filter(
            F.split(F.col("text"), r"\. "),
            lambda s: F.length(F.trim(s)) > 0,
        )
    )
    syls = F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    t = docs.select(
        "source", words.alias("words"), sents.alias("sents"), syls.alias("syls")
    ).groupBy("source").agg(
        F.sum("words").alias("w"),
        F.sum("sents").alias("s"),
        F.sum("syls").alias("y"),
        F.count(F.lit(1)).alias("nd"),
    )
    return t.select(
        "source",
        F.col("nd").cast("long").alias("n_docs"),
        F.col("w").cast("long").alias("words"),
        F.col("s").cast("long").alias("sentences"),
        F.col("y").cast("long").alias("syllables"),
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("w").cast("double") / F.col("s"))
            - 84.6 * (F.col("y").cast("double") / F.col("w")),
            6,
        ).alias("flesch"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# UTF-8 byte diagnostics per lang ([ext] multilingual curation): byte
# vs char totals, expansion factor, share of docs containing any
# non-ASCII — all integers until the final ratios.

QU8_ORACLE = """
WITH d AS (
  SELECT lang, length(text) AS chars, octet_length(encode(text)) AS bytes
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(chars) AS BIGINT) AS n_chars,
       CAST(SUM(bytes) AS BIGINT) AS n_bytes,
       ROUND(CAST(SUM(bytes) AS DOUBLE) / SUM(chars), 6) AS bytes_per_char,
       ROUND(CAST(SUM(CASE WHEN bytes > chars THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS non_ascii_doc_share
FROM d GROUP BY lang ORDER BY lang
"""


@declare(
    "q_utf8_stats",
    oracle=QU8_ORACLE,
    description="UTF-8 expansion diagnostics per lang: byte/char totals, bytes-per-char, non-ASCII doc share — the encoding sanity pass for multilingual corpora (text [ext])",
)
def q_utf8_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    d = docs.select(
        "lang",
        F.length("text").alias("chars"),
        F.octet_length("text").alias("bytes"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("chars").cast("long").alias("n_chars"),
            F.sum("bytes").cast("long").alias("n_bytes"),
            F.round(F.sum("bytes").cast("double") / F.sum("chars"), 6).alias(
                "bytes_per_char"
            ),
            F.round(
                F.sum(F.when(F.col("bytes") > F.col("chars"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("non_ascii_doc_share"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# l-diversity audit ([ext] privacy — the sensitive-attribute companion
# of q_k_anonymity): per (mktsegment, nation) QI group, group size and
# the number of DISTINCT sensitive values (acctbal thousand-bands).
# A release is l-diverse iff min(l) ≥ l.

QLD_ORACLE = """
WITH b AS (
  SELECT c_mktsegment AS seg, c_nationkey AS nation,
         CAST(FLOOR(CAST(c_acctbal AS DECIMAL(18,2)) / 1000) AS BIGINT) AS band
  FROM customer
)
SELECT seg, CAST(nation AS BIGINT) AS nation,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(COUNT(DISTINCT band) AS BIGINT) AS l
FROM b GROUP BY seg, nation
ORDER BY seg, nation
"""


@declare(
    "q_l_diversity",
    oracle=QLD_ORACLE,
    description="l-diversity audit per (mktsegment, nation) QI group: distinct sensitive acctbal bands per group — companion of the k-anonymity audit (privacy [ext])",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")["customer"]
    b = c.select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal").cast("decimal(18,2)") / 1000)
        .cast("long")
        .alias("band"),
    )
    return (
        b.groupBy("seg", "nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.countDistinct("band").cast("long").alias("l"),
        )
        .select(
            "seg",
            F.col("nation").cast("long").alias("nation"),
            "group_size",
            "l",
        )
        .orderBy("seg", "nation")
    )


# ---------------------------------------------------------------------------
# Deterministic 5-fold cross-validation ([ext] ML eval): fold =
# md5(doc_id) mod 5, classifier = the integer-exact " the " heuristic,
# truth = lang = 'en'.  Per-fold accuracy from pure integer cells —
# the fold-assignment + grouped-eval shape of any distributed CV.

QCV_ORACLE = """
WITH s AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 5 AS fold,
         CASE WHEN (position(' the ' IN lower(text)) > 0) = (lang = 'en')
              THEN 1 ELSE 0 END AS correct
  FROM documents
)
SELECT fold, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(correct) AS BIGINT) AS n_correct,
       ROUND(CAST(SUM(correct) AS DOUBLE) / COUNT(*), 6) AS accuracy
FROM s GROUP BY fold ORDER BY fold
"""


@declare(
    "q_cv_folds",
    oracle=QCV_ORACLE,
    description="Deterministic 5-fold CV (md5 fold assignment) of the integer-exact English heuristic vs the lang label: per-fold accuracy from integer cells (ML eval [ext])",
)
def q_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 5
    )
    correct = F.when(
        (F.instr(F.lower(F.col("text")), " the ") > 0) == (F.col("lang") == "en"), 1
    ).otherwise(0)
    s = docs.select(fold.alias("fold"), correct.alias("correct"))
    return (
        s.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("correct").cast("long").alias("n_correct"),
            F.round(F.sum("correct").cast("double") / F.count(F.lit(1)), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("fold")
    )
