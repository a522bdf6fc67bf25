"""Round-38 declared queries — closing the DTW oracle gap, plus the
ExactSubstr dedup lane.

* ``q_exact_substring_spans`` — cross-document duplicated character
  spans (``operators/dedup.duplicated_char_spans``): the distributed
  k-gram-join form of ExactSubstr training-data dedup (Lee et al.,
  ACL 2022).  Completes the dedup matrix: document-level exact
  (hash), near (MinHash/SimHash/n-gram), sentence-grain — and now
  sub-document verbatim spans.

``q_dtw_monthly_pairs`` is the hash-checkable twin of
``q_dtw_priority_pairs`` (VERDICT r7 item 4): the same banded DTW DP
(``operators/sequential.dtw_distance_pairs``), run over MONTHLY
order-count series per priority so the DuckDB oracle — a recursive CTE
marching the DP one (i+j) anti-diagonal per iteration — stays within a
~170-deep recursion at sf0.01 (the daily twin's ~3,500 diagonals keep
it rows-only; the DP itself is identical code either way, so a full
hash match here pins the operator end-to-end).

Oracle construction: the working set of iteration t holds the finished
cells of anti-diagonal d (age 0) plus the carried cells of d-1
(age 1).  Each age-0 cell contributes to its up/left successors and
re-emits itself as the carry; each age-1 cell contributes to its
diagonal successor; a GROUP BY per target cell takes MIN over the ≤3
contributors and adds the |x_i − y_j| step cost.  Out-of-band /
out-of-range targets are filtered, so exactly the banded cells
materialize — the same Sakoe-Chiba band the Spark kernel computes with
``w = max(band, |n−m|)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

QDTWM_ORACLE = """
WITH RECURSIVE monthly AS (
  SELECT o_orderpriority AS p, STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m') AS m,
         COUNT(*) AS y
  FROM orders GROUP BY 1, 2
), s AS (
  SELECT p, CAST(y AS DOUBLE) AS y,
         ROW_NUMBER() OVER (PARTITION BY p ORDER BY m) AS i,
         COUNT(*) OVER (PARTITION BY p) AS n
  FROM monthly
), pr AS (
  SELECT a.p AS ka, b.p AS kb, a.n AS na, b.n AS nb,
         GREATEST(7, ABS(a.n - b.n)) AS w
  FROM (SELECT DISTINCT p, n FROM s) a
  JOIN (SELECT DISTINCT p, n FROM s) b ON a.p < b.p
), dp AS (
  SELECT pr.ka, pr.kb, 0 AS age, 1 AS i, 1 AS j, ABS(xa.y - xb.y) AS acc
  FROM pr
  JOIN s xa ON xa.p = pr.ka AND xa.i = 1
  JOIN s xb ON xb.p = pr.kb AND xb.i = 1
  UNION ALL
  SELECT c.ka, c.kb, c.age, c.i, c.j,
         MIN(c.pred + CASE WHEN c.age = 0 THEN ABS(xa.y - xb.y) ELSE 0 END)
  FROM (
    SELECT d.ka, d.kb,
           struct_extract(u.t, 'age') AS age,
           struct_extract(u.t, 'i') AS i,
           struct_extract(u.t, 'j') AS j,
           d.acc AS pred
    FROM dp d,
      UNNEST(CASE WHEN d.age = 0 THEN [
               struct_pack(age := 1, i := d.i, j := d.j),
               struct_pack(age := 0, i := d.i + 1, j := d.j),
               struct_pack(age := 0, i := d.i, j := d.j + 1)]
             ELSE [struct_pack(age := 0, i := d.i + 1, j := d.j + 1)] END
      ) AS u(t)
  ) c
  JOIN pr p2 ON p2.ka = c.ka AND p2.kb = c.kb
  LEFT JOIN s xa ON c.age = 0 AND xa.p = c.ka AND xa.i = c.i
  LEFT JOIN s xb ON c.age = 0 AND xb.p = c.kb AND xb.i = c.j
  WHERE c.age = 1
     OR (c.i <= p2.na AND c.j <= p2.nb AND ABS(c.i - c.j) <= p2.w)
  GROUP BY c.ka, c.kb, c.age, c.i, c.j
)
SELECT d.ka AS key_a, d.kb AS key_b, p2.na AS n_a, p2.nb AS n_b,
       CAST(d.acc AS DOUBLE) AS dtw
FROM dp d JOIN pr p2 ON p2.ka = d.ka AND p2.kb = d.kb
WHERE d.age = 0 AND d.i = p2.na AND d.j = p2.nb
ORDER BY key_a, key_b
"""


@declare(
    "q_dtw_monthly_pairs",
    oracle=QDTWM_ORACLE,
    description="banded DTW distance between monthly order-count series of every priority pair — the fully hash-checked twin of q_dtw_priority_pairs: same applyInPandas DP, monthly grain keeps the DuckDB anti-diagonal recursive-CTE oracle ~170 iterations deep (time-series similarity [ext])",
)
def q_dtw_monthly_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sequential import dtw_distance_pairs

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("m"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    out = dtw_distance_pairs(monthly, "priority", "m", "y", band=7)
    return out.orderBy("key_a", "key_b")


# The UNNEST bound (1..600) must cover len(text)-k+1 at the oracle's
# sf0.01 fixture (max text length 553); the WHERE clause trims it
# exactly, so a larger bound is only wasted rows, never wrong rows.
QEXSUB_ORACLE = """
WITH g AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
         substr(text, CAST(u.i AS INTEGER), 40) AS gram
  FROM documents CROSS JOIN UNNEST(range(1, 601)) AS u(i)
  -- doc_id IS NOT NULL mirrors the Spark kernel's NULL contract
  -- (duplicated_char_spans drops NULL-id documents up front): without
  -- it a NULL-id doc with duplicated text would emit island rows here
  -- that the Spark side never produces (ADVICE r8)
  WHERE doc_id IS NOT NULL
    AND length(text) >= 40 AND u.i <= length(text) - 39
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
), p AS (
  SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)
), l AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM p
), i AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos > prev + 40 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM l
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + 39 AS BIGINT) AS span_end,
       CAST(MAX(pos) + 39 - MIN(pos) + 1 AS BIGINT) AS span_chars,
       CAST(COUNT(*) AS BIGINT) AS n_dup_grams
FROM i GROUP BY doc_id, isl
ORDER BY doc_id, span_start
"""


@declare(
    "q_exact_substring_spans",
    oracle=QEXSUB_ORACLE,
    description="cross-document duplicated character spans: k-gram positions → doc-frequency ≥ 2 → position rejoin → per-doc island merge — the distributed ExactSubstr dedup of Lee et al. ACL'22 (LLM dedup [ext])",
)
def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import duplicated_char_spans

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    spans = duplicated_char_spans(docs, "doc_id", "text", k=40, min_docs=2)
    return spans.orderBy("doc_id", "span_start")
