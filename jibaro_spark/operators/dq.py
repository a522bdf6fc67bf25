"""Data-quality expectation checks ([ext] — the constraint/expectation
layer a production lakehouse pipeline runs before promoting a batch to
the curated layer; the engine-native analogue of Delta constraint /
DLT-expectation checks, which the reference — raw Delta writes only —
lacks entirely).

Three check shapes, all scale-safe:

* :func:`expect` — row-level predicates, ALL evaluated in ONE scan
  (a single aggregate of violation counters; no per-rule pass).
* :func:`uniqueness_violations` — key groups with count > 1 (one
  key-partitioned aggregate; output is violation-sized).
* :func:`fk_violations` — child keys absent from the parent (left-anti
  join; parent side distinct-collapsed so a dimension FK broadcasts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate row-level expectations in one scan.

    ``checks`` maps rule name → VIOLATION predicate (true ⇔ the row
    violates the rule; null counts as a violation — an unexpected null
    inside a range check is a data problem, not a pass).  Returns one
    row per rule: ``(rule, n_rows, n_violations, pass)``, ordered by
    rule name.  Physically a single aggregate with one conditional-sum
    counter per rule — adding rules adds zero scans.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")] + [
        F.sum(
            F.when(F.coalesce(cond, F.lit(True)), F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(f"__v_{i}")
        for i, cond in enumerate(checks.values())
    ]
    row = df.agg(*aggs)
    names = list(checks.keys())
    pairs = F.array(
        *[
            F.struct(
                F.lit(n).alias("rule"), F.col(f"__v_{i}").alias("n_violations")
            )
            for i, n in enumerate(names)
        ]
    )
    return (
        row.select(F.col("__n").alias("n_rows"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            "n_rows",
            F.col("p.n_violations").alias("n_violations"),
            (F.col("p.n_violations") == 0).alias("pass"),
        )
        .orderBy("rule")
    )


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key tuples appearing more than once: ``(keys..., n_rows)``,
    violation-sized output."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def fk_violations(
    child: DataFrame,
    parent: DataFrame,
    child_keys: list[str],
    parent_keys: list[str] | None = None,
) -> DataFrame:
    """Child rows whose key has no parent (referential-integrity
    violations).  The parent side is distinct-collapsed first, so a
    dimension-sized parent broadcasts and the check is one semi-join
    shape — at 100 TB the child is scanned once."""
    pk = parent_keys or child_keys
    p = parent.select(
        *[F.col(a).alias(b) for a, b in zip(pk, child_keys)]
    ).dropDuplicates(child_keys)
    return child.join(p, child_keys, "left_anti")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-scan column profiler: per column, row/null/distinct counts
    and the min/max rendered as strings — the "describe my table"
    primitive a curation pipeline runs before writing expectations
    (the numbers :func:`expect` thresholds are then derived from).

    Returns ``(col_name, n_rows, n_nulls, n_distinct, min_value,
    max_value)``, one row per profiled column, ordered by name.

    Physically a SINGLE aggregate over one scan: the exact multi-column
    ``count(DISTINCT col)``s compile to one Expand (rows × #cols) with
    map-side partial aggregation — the standard exact-profile shape.
    At 100 TB profile either a sample or swap ``approx_count_distinct``
    in via ``exact=False``-style wrappers; exactness here is what lets
    the DuckDB oracle pin the operator.
    """
    cols = columns or df.columns
    aggs: list = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("long").alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).cast("long").alias(f"__nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("col_name")
    )
