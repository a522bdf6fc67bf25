"""Round-34 declared queries — split-contamination auditing.

* ``q_contamination_matrix`` — the cross-split contamination matrix:
  deterministic md5 train/val/test split, DISTINCT word-4-gram
  presence per split, and for every ordered split pair the shared
  gram count and directional containment |A∩B|/|A| — the audit that
  generalizes q_decontaminate's one-direction check to the full
  split design.  Counts-first: grams collapse to one row with three
  presence flags; every pairwise cell is a sum of flag products.

Cross-engine conventions follow ``queries/registry.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.llm import _zipgrams
from jibaro_spark.queries.registry import declare, load_tables

_TOKS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"

QCM_ORACLE = f"""
WITH t AS (
  SELECT CASE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10
           WHEN 8 THEN 'val' WHEN 9 THEN 'test' ELSE 'train' END AS split,
         {_TOKS} AS w
  FROM documents
), sh AS (
  SELECT DISTINCT split,
         unnest(list_distinct({_zipgrams('w', 4)})) AS gram
  FROM t
), flags AS (
  SELECT gram,
         MAX(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS in_train,
         MAX(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS in_val,
         MAX(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS in_test
  FROM sh GROUP BY gram
), cells AS (
  SELECT CAST(SUM(in_train) AS BIGINT) AS n_train,
         CAST(SUM(in_val) AS BIGINT) AS n_val,
         CAST(SUM(in_test) AS BIGINT) AS n_test,
         CAST(SUM(in_train * in_val) AS BIGINT) AS tv,
         CAST(SUM(in_train * in_test) AS BIGINT) AS tt,
         CAST(SUM(in_val * in_test) AS BIGINT) AS vt
  FROM flags
)
SELECT * FROM (
  SELECT 'train' AS split_a, 'val' AS split_b, tv AS n_shared,
         ROUND(CAST(tv AS DOUBLE) / n_train, 6) AS containment FROM cells
  UNION ALL SELECT 'val', 'train', tv, ROUND(CAST(tv AS DOUBLE) / n_val, 6) FROM cells
  UNION ALL SELECT 'train', 'test', tt, ROUND(CAST(tt AS DOUBLE) / n_train, 6) FROM cells
  UNION ALL SELECT 'test', 'train', tt, ROUND(CAST(tt AS DOUBLE) / n_test, 6) FROM cells
  UNION ALL SELECT 'val', 'test', vt, ROUND(CAST(vt AS DOUBLE) / n_val, 6) FROM cells
  UNION ALL SELECT 'test', 'val', vt, ROUND(CAST(vt AS DOUBLE) / n_test, 6) FROM cells
)
ORDER BY split_a, split_b
"""


@declare(
    "q_contamination_matrix",
    oracle=QCM_ORACLE,
    description="Cross-split contamination matrix: md5 train/val/test split, distinct word-4-gram presence flags, shared-gram counts and directional containment per ordered split pair — the full-design generalization of q_decontaminate (LLM training audit [ext])",
)
def q_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import shingles

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    split = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
    )
    sh = (
        docs.select(
            F.when(split == 8, "val")
            .when(split == 9, "test")
            .otherwise("train")
            .alias("split"),
            F.explode(F.array_distinct(shingles(F.col("text"), 4))).alias("gram"),
        )
        .distinct()
    )
    flags = sh.groupBy("gram").agg(
        F.max((F.col("split") == "train").cast("int")).alias("in_train"),
        F.max((F.col("split") == "val").cast("int")).alias("in_val"),
        F.max((F.col("split") == "test").cast("int")).alias("in_test"),
    )
    cells = flags.agg(
        F.sum("in_train").cast("long").alias("n_train"),
        F.sum("in_val").cast("long").alias("n_val"),
        F.sum("in_test").cast("long").alias("n_test"),
        F.sum(F.col("in_train") * F.col("in_val")).cast("long").alias("tv"),
        F.sum(F.col("in_train") * F.col("in_test")).cast("long").alias("tt"),
        F.sum(F.col("in_val") * F.col("in_test")).cast("long").alias("vt"),
    )
    cells = cells.localCheckpoint(eager=True)  # 6 union branches share it
    pairs = [
        ("train", "val", "tv", "n_train"),
        ("val", "train", "tv", "n_val"),
        ("train", "test", "tt", "n_train"),
        ("test", "train", "tt", "n_test"),
        ("val", "test", "vt", "n_val"),
        ("test", "val", "vt", "n_test"),
    ]
    out = None
    for a, b, num, den in pairs:
        branch = cells.select(
            F.lit(a).alias("split_a"),
            F.lit(b).alias("split_b"),
            F.col(num).alias("n_shared"),
            F.round(F.col(num).cast("double") / F.col(den), 6).alias(
                "containment"
            ),
        )
        out = branch if out is None else out.unionByName(branch)
    return out.orderBy("split_a", "split_b")
