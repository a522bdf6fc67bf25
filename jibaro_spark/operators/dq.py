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
