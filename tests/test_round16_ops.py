"""Round-16 family tests: log-rank internal consistency (O/E mass
balance against the pooled death count, chi2 formula), Cochran-
Armitage T identity, Heaps-law monotonicity laws, Markov stationary
mass conservation, and no-cartesian plan shapes.
"""

from __future__ import annotations

import pytest

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_logrank_consistency(spark, duck):
    r = REGISTRY["q_logrank_test"].fn(spark, SF).collect()[0]
    assert r["n_times"] > 0 and r["variance"] > 0
    # group-1 observed deaths ≤ total deaths; E1 close to O1+O0 share
    total_d = duck.sql(
        """
        WITH first_ev AS (SELECT user_id, MIN(ts) t0 FROM events GROUP BY 1),
        fb AS (SELECT user_id, MIN(ts) tp FROM events
               WHERE event_type='purchase' GROUP BY 1),
        raw AS (SELECT (epoch_us(p.tp)-epoch_us(f.t0))//3600000000 h
                FROM first_ev f LEFT JOIN fb p USING (user_id))
        SELECT SUM(CASE WHEN h IS NOT NULL AND h <= 72 THEN 1 ELSE 0 END)
        FROM raw
        """
    ).fetchall()[0][0]
    assert 0 <= r["o1"] <= total_d
    # E1 sums the d*n1/n shares — bounded by the total death count
    assert 0 < r["e1"] < total_d
    assert abs(r["chi2"] - round((r["o1"] - r["e1"]) ** 2 / r["variance"], 6)) < 1e-4


def test_cochran_armitage_t_identity(spark):
    rows = REGISTRY["q_cochran_armitage"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_returned"] <= r["n"]
        assert r["variance"] > 0
        assert abs(r["chi2"] - round(r["t_stat"] ** 2 / r["variance"], 6)) < 1e-4


def test_heaps_law_monotone(spark):
    rows = sorted(
        REGISTRY["q_heaps_law"].fn(spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] >= a["n_docs"]
        assert b["tokens_seen"] > a["tokens_seen"]
        assert b["vocab"] >= a["vocab"]
    for r in rows:
        assert r["vocab"] <= r["tokens_seen"]  # V(n) ≤ n always
    # sub-linear growth: vocab share of tokens falls as the corpus grows
    assert rows[-1]["vocab"] / rows[-1]["tokens_seen"] < (
        rows[0]["vocab"] / rows[0]["tokens_seen"]
    )


def test_markov_stationary_mass_conserved(spark):
    rows = REGISTRY["q_markov_stationary"].fn(spark, SF).collect()
    assert rows
    total = sum(r["pi3"] for r in rows)
    # each step rounds to 10 decimals and drops sink-state leakage only
    # if a state loses all outgoing edges (none in this fixture)
    assert abs(total - 1.0) < 1e-4
    assert all(r["pi3"] > 0 for r in rows)


@pytest.mark.parametrize(
    "qname",
    ["q_logrank_test", "q_cochran_armitage", "q_heaps_law", "q_markov_stationary"],
)
def test_round16_no_cartesian(spark, qname):
    plan = REGISTRY[qname].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
