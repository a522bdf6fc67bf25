"""STAGED DuckDB oracle twins for fuzz-probe use (VERDICT r10 #5).

Some registered single-statement oracles chain multiply-referenced
CTEs that DuckDB re-inlines super-linearly on mutated (densified)
fixtures — evaluating stage r re-runs every earlier stage's join.  A
staged twin materializes each stage as a temp table exactly once with
byte-identical semantics (same ``NOT IN`` forms over the same row
sets), making the probe hash-checkable end-to-end.  Registered driver
oracles are untouched (they are fine at sf0.01).

Side-effect-free on import (no SparkSession) so pytest guards can
import it directly instead of exec-ing a source slice of the fuzz
harness (ADVICE r11 #3).
"""

from __future__ import annotations


def _kcore_staged_oracle() -> "list[str]":
    """Staged twin of ``q_kcore_peel``'s registered oracle.  The
    single-statement oracle chains each peel round's edge set through
    ``NOT IN`` subqueries; DuckDB re-inlines multiply-referenced CTEs
    there, so evaluating round r re-runs every earlier round's
    lineitem self-join — exponential re-evaluation that exhausted
    local disk on the r10 sf0.1 skew probe.  One temp table per peel
    round runs every stage EXACTLY ONCE."""
    from jibaro_spark.queries.round11 import _KC_K, _KC_R

    stmts = [
        """CREATE OR REPLACE TEMP TABLE kc_co AS
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(*) AS cnt
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2""",
        """CREATE OR REPLACE TEMP TABLE kc_s0 AS
  WITH st AS (SELECT CEIL(1.3 * (SUM(cnt) / COUNT(*))) AS thr FROM kc_co),
  e0 AS (SELECT u, v FROM kc_co, st WHERE cnt >= thr)
  SELECT u AS src, v AS dst FROM e0 UNION SELECT v, u FROM e0""",
        """CREATE OR REPLACE TEMP TABLE kc_a0 AS
  SELECT DISTINCT l_suppkey AS n FROM lineitem""",
    ]
    for r in range(1, _KC_R + 1):
        stmts += [
            f"""CREATE OR REPLACE TEMP TABLE kc_k{r} AS
  SELECT n FROM kc_a{r-1} LEFT JOIN
    (SELECT src, COUNT(*) AS deg FROM kc_s{r-1} GROUP BY src) d ON n = d.src
  WHERE COALESCE(deg, 0) < {_KC_K}""",
            f"""CREATE OR REPLACE TEMP TABLE kc_s{r} AS
  SELECT src, dst FROM kc_s{r-1}
  WHERE src NOT IN (SELECT n FROM kc_k{r})
    AND dst NOT IN (SELECT n FROM kc_k{r})""",
            f"""CREATE OR REPLACE TEMP TABLE kc_a{r} AS
  SELECT n FROM kc_a{r-1} WHERE n NOT IN (SELECT n FROM kc_k{r})""",
        ]
    rounds_case = " ".join(
        f"WHEN kc_a0.n IN (SELECT n FROM kc_k{r}) THEN {r}"
        for r in range(1, _KC_R + 1)
    )
    stmts.append(
        f"""SELECT kc_a0.n AS suppkey,
       CAST(CASE {rounds_case} END AS BIGINT) AS peeled_round,
       CAST(CASE WHEN kc_a0.n IN (SELECT n FROM kc_a{_KC_R})
                 THEN COALESCE(f.deg, 0) END AS BIGINT) AS deg
FROM kc_a0 LEFT JOIN
  (SELECT src, COUNT(*) AS deg FROM kc_s{_KC_R} GROUP BY src) f
  ON kc_a0.n = f.src
ORDER BY suppkey"""
    )
    return stmts


# name -> zero-arg callable returning the ordered statement list; the
# LAST statement's result is what gets hash-compared.
STAGED_ORACLES: "dict[str, callable]" = {
    "q_kcore_peel": _kcore_staged_oracle,
}
