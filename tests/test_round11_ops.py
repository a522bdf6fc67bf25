"""Round-11 family tests: kcore_peel semantics pinned against a
Python reference peel (cascade, isolated nodes, node universe,
guards), rank-statistic sanity on constructed fixtures (Spearman ±1 on
monotone data, Kendall exact brute-force parity on a small grid),
Breslow-vs-KM dominance, join-size estimator exactness when the
histogram covers every key, and no-cartesian plan shapes.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jibaro_spark.operators.graph import kcore_peel
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# kcore_peel vs a Python reference


def _py_peel(edges, nodes, k, rounds):
    adj = {n: set() for n in nodes}
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    alive = set(nodes)
    peeled = {}
    for r in range(1, rounds + 1):
        kill = {n for n in alive if len(adj[n] & alive) < k}
        if not kill:
            break
        for n in kill:
            peeled[n] = r
        alive -= kill
    deg = {n: len(adj[n] & alive) for n in alive}
    return peeled, deg


def _run_peel(spark, edges, nodes, k, rounds):
    e = spark.createDataFrame(edges, "src long, dst long")
    nd = spark.createDataFrame([(n,) for n in nodes], "node long")
    rows = kcore_peel(e, k=k, rounds=rounds, nodes=nd).collect()
    got_peeled = {r["node"]: r["peeled_round"] for r in rows if r["peeled_round"]}
    got_deg = {r["node"]: r["deg"] for r in rows if r["peeled_round"] is None}
    return got_peeled, got_deg, rows


def test_kcore_cascade_matches_reference(spark):
    # path graph 1-2-3-4-5 plus a 4-clique {10,11,12,13}: k=2 peels the
    # path endpoints first, then the exposed next-in-line, while the
    # clique survives untouched.
    edges = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    nodes = [1, 2, 3, 4, 5, 10, 11, 12, 13]
    want_peeled, want_deg = _py_peel(edges, nodes, k=2, rounds=4)
    got_peeled, got_deg, _ = _run_peel(spark, edges, nodes, k=2, rounds=4)
    assert got_peeled == want_peeled
    assert got_deg == want_deg
    assert want_peeled == {1: 1, 5: 1, 2: 2, 4: 2, 3: 3}  # staged cascade


def test_kcore_isolated_node_peels_round_one(spark):
    got_peeled, got_deg, rows = _run_peel(
        spark, [(1, 2), (2, 3), (1, 3)], nodes=[1, 2, 3, 99], k=2, rounds=2
    )
    assert got_peeled == {99: 1}
    assert got_deg == {1: 2, 2: 2, 3: 2}


def test_kcore_defaults_node_universe_to_endpoints(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    rows = kcore_peel(e, k=1, rounds=1).collect()
    assert {r["node"] for r in rows} == {1, 2, 3}


def test_kcore_fixed_rounds_stop_early_peels(spark):
    # with rounds=1 only the first wave is peeled; node 2 survives
    # with a sub-k final degree (it would peel in round 2)
    got_peeled, got_deg, _ = _run_peel(
        spark, [(1, 2), (2, 3), (3, 4), (4, 5)], [1, 2, 3, 4, 5], k=2, rounds=1
    )
    assert got_peeled == {1: 1, 5: 1}
    assert got_deg == {2: 1, 3: 2, 4: 1}


def test_kcore_guards(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        kcore_peel(e, k=0, rounds=1)
    with pytest.raises(ValueError):
        kcore_peel(e, k=1, rounds=0)


# ---------------------------------------------------------------------------
# Rank statistics on constructed fixtures


def test_spearman_formula_on_monotone_and_reversed():
    """Reuse the query's moment pipeline shape inline: perfectly
    monotone data has rho=1, reversed has rho=-1, via integer
    double-ranks."""
    import math

    xs = [3, 1, 4, 1, 5, 9, 2, 6]
    for flip, want in ((False, 1.0), (True, -1.0)):
        ys = [(-x if flip else x) * 10 for x in xs]
        # python reference of the double-rank spearman
        def dranks(vals):
            s = sorted(vals)
            return {
                v: 2 * (len([u for u in s if u < v]) + vals.count(v)) - vals.count(v) + 1
                for v in set(vals)
            }
        # tie-free here except duplicated 1
        rx, ry = dranks(xs), dranks(ys)
        ax = [rx[v] for v in xs]
        ay = [ry[v] for v in ys]
        n = len(xs)
        sx, sy = sum(ax), sum(ay)
        sxx = sum(a * a for a in ax)
        syy = sum(a * a for a in ay)
        sxy = sum(a * b for a, b in zip(ax, ay))
        rho = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        assert round(rho, 6) == want


def test_kendall_concordance_counts_match_brute_force(spark, duck):
    """The 2-D suffix-sum concordance counts equal a brute-force O(n²)
    pair sweep over the binned values (DuckDB as the reference
    engine; each unordered pair appears twice in the self-join)."""
    brute_rows = duck.sql(
        """
        WITH b AS (
          SELECT o_orderpriority AS pr,
                 LEAST((CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        * 10) // 60000000, 9) AS i,
                 LEAST(GREATEST((CAST(CAST(o_orderdate AS DATE)
                        - DATE '1970-01-01' AS BIGINT) - 9100) // 280, 0), 9) AS j
          FROM orders
        )
        SELECT a.pr,
               SUM(CASE WHEN (a.i - b2.i) * (a.j - b2.j) > 0 THEN 1 ELSE 0 END) AS c,
               SUM(CASE WHEN (a.i - b2.i) * (a.j - b2.j) < 0 THEN 1 ELSE 0 END) AS d
        FROM b a JOIN b b2 ON a.pr = b2.pr
        GROUP BY a.pr ORDER BY a.pr
        """
    ).fetchall()
    brute = {r[0]: (r[1] // 2, r[2] // 2) for r in brute_rows}
    got = {
        r["pr"]: (r["concordant"], r["discordant"])
        for r in REGISTRY["q_kendall_tau"].fn(spark, SF).collect()
    }
    assert got == brute


# ---------------------------------------------------------------------------
# Survival: Breslow exp(-H) dominates Kaplan-Meier at every time


def test_breslow_dominates_km(spark):
    na = {
        r["dur"]: r["breslow_survival"]
        for r in REGISTRY["q_nelson_aalen"].fn(spark, SF).collect()
    }
    km = {
        r["dur"]: r["survival"]
        for r in REGISTRY["q_kaplan_meier"].fn(spark, SF).collect()
    }
    assert set(na) == set(km)
    for dur in na:
        assert na[dur] >= km[dur] - 1e-9, f"dur={dur}: {na[dur]} < {km[dur]}"


# ---------------------------------------------------------------------------
# Join-size estimator: exact when the histogram covers every key


def test_join_size_estimate_exact_when_top_covers_all(spark):
    df = spark.createDataFrame(
        [("A", k % 5) for k in range(50)], "flag string, k long"
    )
    c = df.groupBy("flag", "k").agg(F.count(F.lit(1)).alias("cnt"))
    # 5 distinct keys < 20 → top bucket covers everything, rest empty
    rows = c.groupBy("flag").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("exact")
    ).collect()
    assert rows[0]["exact"] == 5 * 10 * 10
    got = (
        REGISTRY["q_join_size_estimate"].fn(spark, SF).collect()
    )
    for r in got:
        assert r["exact_pairs"] > 0
        # estimator is top-20-exact + uniform rest — must be within 2×
        assert 0.5 < r["est_pairs"] / r["exact_pairs"] < 2.0


# ---------------------------------------------------------------------------
# Sentence dedup invariants


def test_sentence_dedup_invariants(spark):
    rows = REGISTRY["q_sentence_dedup"].fn(spark, SF).collect()
    assert rows, "no sources produced sentences"
    for r in rows:
        assert r["n_unique"] <= r["n_sents"]
        assert r["within_doc_dup"] >= 0
        assert r["cross_doc_sents"] <= r["n_unique"]
        assert 0.0 <= r["dup_ratio"] <= 1.0


# ---------------------------------------------------------------------------
# Plan shape: no cartesian beyond 1-row scalar broadcasts


@pytest.mark.parametrize(
    "qname",
    [
        "q_spearman_corr",
        "q_kendall_tau",
        "q_kcore_peel",
        "q_nelson_aalen",
        "q_sentence_dedup",
        "q_join_size_estimate",
    ],
)
def test_round11_no_cartesian(spark, qname):
    plan = REGISTRY[qname].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
