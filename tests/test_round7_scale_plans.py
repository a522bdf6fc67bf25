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
    """The two genuinely dimension-sized parents (supplier, nation) are
    hinted broadcast; the fact-scale parents (orders, part, customer)
    carry NO hint — AQE picks broadcast vs shuffle from runtime stats,
    so a forced driver-side broadcast of an orders-sized key-set can
    never OOM at scale.  No cartesian product anywhere."""
    plan = _executed_plan(REGISTRY["q_fk_orphan_audit"].fn(spark, SF))
    assert "CartesianProduct" not in plan
    # the 2 hinted dim edges must broadcast; AQE may broadcast more at
    # this tiny SF, which is fine — the assertion is a floor, not a pin
    assert plan.count("BroadcastHashJoin") >= 2, plan


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
