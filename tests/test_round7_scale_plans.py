"""Plan-shape assertions for the round-7 query families: dimension
key-sets must broadcast in the FK audit, pair fan-outs must be keyed
joins (never cartesian), corpus-sized windows must stay key-partitioned
(the only tolerated SinglePartition is a final ≤group-count rollup),
and the reconciliation checksum must be a single-agg scan with no join.
"""

from __future__ import annotations

import pytest

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_fk_audit_broadcasts_dim_keysets(spark):
    """Every FK edge is child ⟕ parent-keys with the key-set broadcast
    (dimension-sized side); no cartesian product, no shuffle of the
    fact side beyond the final 1-row-per-edge aggregation."""
    plan = _executed_plan(REGISTRY["q_fk_orphan_audit"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # 5 edges -> 5 broadcast joins (one per child⟕keys probe)
    assert plan.count("BroadcastHashJoin") >= 5, plan


def test_partition_checksums_is_one_agg_no_join(spark):
    """The reconciliation checksum is scan → partial agg → 64-row
    exchange → final agg: no join anywhere, one shuffle."""
    plan = _executed_plan(REGISTRY["q_partition_checksums"].fn(spark, SF))
    for bad in ("Join", "CartesianProduct"):
        assert bad not in plan, plan
    assert "HashAggregate" in plan


def test_ks_pair_fanout_is_broadcast_not_cartesian(spark):
    """The 10-way priority-pair fan-out joins the distinct-value count
    table against a broadcast pair list; the ECDF windows partition by
    pair — the value table is never collapsed to one task."""
    plan = _executed_plan(REGISTRY["q_ks_test"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan, plan


@pytest.mark.parametrize(
    "qname",
    ["q_pareto_cutoff", "q_weighted_median", "q_transition_entropy",
     "q_order_gap_stats"],
)
def test_round7_windows_stay_key_partitioned(spark, qname):
    """Cumulative/lag windows in the round-7 queries partition on their
    group key (nation / return flag / user) — no SinglePartition window
    over corpus-sized data."""
    plan = _executed_plan(REGISTRY[qname].fn(spark, SF))
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan, plan
