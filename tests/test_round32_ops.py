"""Round-32 family tests: bottom-k determinism and Friedman/Kendall-W
consistency identity.
"""

from __future__ import annotations

import hashlib

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_bottomk_priorities_are_md5(spark):
    rows = REGISTRY["q_bottomk_sample"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["priority"] == hashlib.md5(r["user_id"].encode()).hexdigest()
        assert 1 <= r["rank"] <= 16


def test_friedman_kendall_identity(spark):
    f = REGISTRY["q_friedman_test"].fn(spark, SF).collect()[0]
    w = REGISTRY["q_kendall_w"].fn(spark, SF).collect()[0]
    # chi2_F = m(n-1)W holds when both run over the same complete
    # design; the W query uses all nations, so only check when the
    # designs coincide (every nation present every year)
    if f["n_nations"] == w["n_nations"]:
        m, n = f["n_years"], f["n_nations"]
        assert abs(f["friedman_chi2"] - m * (n - 1) * w["kendall_w"]) < 0.01
    assert f["friedman_chi2"] >= 0.0


def test_boruvka_mst_is_spanning_tree(spark):
    from jibaro_spark.operators.graph import boruvka_mst
    from pyspark.sql import functions as F

    # hand graph: two clusters bridged by one heavy edge + a cycle
    edges = spark.createDataFrame(
        [
            (1, 2, 1), (2, 3, 2), (1, 3, 9),          # cycle: drop (1,3)
            (4, 5, 1), (5, 6, 3), (4, 6, 3),          # tie broken by (a,b)
            (3, 4, 7),                                 # the bridge
        ],
        "src long, dst long, w long",
    )
    mst = {(r["src"], r["dst"], r["w"]) for r in boruvka_mst(edges).collect()}
    assert len(mst) == 5  # 6 nodes → 5 edges
    assert (1, 3, 9) not in mst          # heaviest cycle edge dropped
    assert (3, 4, 7) in mst              # bridges always survive
    assert (4, 6, 3) in mst and (5, 6, 3) not in mst  # tie: (4,6)<(5,6)
    total = sum(w for _, _, w in mst)
    assert total == 1 + 2 + 1 + 3 + 7


def test_boruvka_query_tree_laws(spark):
    rows = REGISTRY["q_boruvka_mst"].fn(spark, SF).collect()
    assert rows
    nodes = {r["src"] for r in rows} | {r["dst"] for r in rows}
    # a forest never has more edges than nodes - #components >= nodes-1... 
    # for the (connected) trade graph: exactly |V| - 1 edges
    assert len(rows) == len(nodes) - 1
    # acyclic: union-find replay finds no cycle
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r["src"]), find(r["dst"])
        assert ra != rb, "cycle in MST output"
        parent[ra] = rb
