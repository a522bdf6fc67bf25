"""Round-8 family tests: Fellegi-Sunter linkage semantics + guardrails,
and plan-shape assertions for the round-8 queries (blocked joins only,
top-k via TakeOrdered, no cartesian products).

The value-level correctness of all 7 round-8 queries is covered by the
parametrized oracle hash-match in tests/test_oracle_queries.py; these
tests pin the operator contract and the 100 TB plan shapes.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jibaro_spark.operators.linkage import FieldComparator, fellegi_sunter_join
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _sides(spark):
    a = spark.createDataFrame(
        [(1, "US", "alice"), (2, "US", "bob"), (3, "FR", "chloe")],
        "a_id int, a_nat string, a_name string",
    )
    b = spark.createDataFrame(
        [(10, "US", "alice"), (11, "US", "carol"), (12, "DE", "dieter")],
        "b_id int, b_nat string, b_name string",
    )
    return a, b


def test_linkage_requires_blocking_keys(spark):
    a, b = _sides(spark)
    comp = [FieldComparator("name", F.col("a_name") == F.col("b_name"), 0.9, 0.01)]
    with pytest.raises(ValueError, match="blocking keys"):
        fellegi_sunter_join(a, b, "a_id", "b_id", [], comp, 1.0, -1.0)


def test_linkage_rejects_overlapping_columns(spark):
    a, _ = _sides(spark)
    comp = [FieldComparator("name", F.col("a_name") == F.col("a_name"), 0.9, 0.01)]
    with pytest.raises(ValueError, match="share column names"):
        fellegi_sunter_join(a, a, "a_id", "a_id", [("a_nat", "a_nat")], comp, 1, -1)


def test_linkage_decision_bands(spark):
    """Agreeing names inside a block score the agree weight
    (log2(0.9/0.01) ≈ 6.49 ≥ upper → match); disagreeing names score
    the disagree weight (≈ −3.3 ≤ lower → non_match); cross-block pairs
    never become candidates at all."""
    a, b = _sides(spark)
    comp = [FieldComparator("name", F.col("a_name") == F.col("b_name"), 0.9, 0.01)]
    out = fellegi_sunter_join(
        a, b, "a_id", "b_id", [("a_nat", "b_nat")], comp, upper=3.0, lower=-1.0
    )
    rows = {(r["a_id"], r["b_id"]): r["decision"] for r in out.collect()}
    assert rows == {
        (1, 10): "match",
        (1, 11): "non_match",
        (2, 10): "non_match",
        (2, 11): "non_match",
    }  # FR/DE rows blocked out — no candidate, no row


def test_linkage_scores_are_exact_decimal_sums(spark):
    """The score column is a decimal sum of literal weights — no float
    accumulation in the plan (the cross-engine hash contract)."""
    a, b = _sides(spark)
    comp = [
        FieldComparator("name", F.col("a_name") == F.col("b_name"), 0.9, 0.01),
        FieldComparator("nat", F.col("a_nat") == F.col("b_nat"), 0.95, 0.2),
    ]
    out = fellegi_sunter_join(
        a, b, "a_id", "b_id", [("a_nat", "b_nat")], comp, 9.0, -9.0
    )
    assert out.schema["score"].dataType.simpleString() == "decimal(28,6)"


def test_record_linkage_plan_is_blocked_join(spark):
    """q_record_linkage candidates come from the nation equi-join —
    never a cartesian pass over customer × replica."""
    plan = _executed_plan(REGISTRY["q_record_linkage"].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan


def test_hill_tail_topk_is_take_ordered(spark):
    """The top-500 tail draw compiles to TakeOrderedAndProject
    (per-partition bottom-k + k-row merge), not a global sort."""
    df = REGISTRY["q_hill_tail_index"].fn(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "GlobalLimit" in plan or "Limit" in plan, plan


@pytest.mark.parametrize(
    "qname",
    ["q_cohen_kappa", "q_ngram_novelty", "q_wasserstein_1d",
     "q_bootstrap_ci_mean", "q_hhi_concentration"],
)
def test_round8_no_cartesian(spark, qname):
    """Every round-8 pair/replica fan-out is a keyed or broadcast join;
    nothing falls back to CartesianProduct."""
    plan = _executed_plan(REGISTRY[qname].fn(spark, SF))
    assert "CartesianProduct" not in plan, plan
