"""Round-20 family tests: Croston recurrence pinned against a
pure-Python reference, and demand/interval-state laws on the fixture.
"""

from __future__ import annotations

from jibaro_spark.operators.sequential import croston
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _croston_ref(xs, a=0.5):
    z = p = None
    q = 1
    out = []
    for x in xs:
        if x > 0:
            if z is None:
                z, p = x, float(q)
            else:
                z = a * x + (1 - a) * z
                p = a * float(q) + (1 - a) * p
            q = 1
        else:
            q += 1
        out.append((z, p, (z / p) if z is not None else None))
    return out


def test_croston_matches_pure_python(spark):
    xs = [0.0, 0.0, 3.0, 0.0, 0.0, 0.0, 2.0, 5.0, 0.0, 1.0, 0.0, 0.0, 4.0]
    rows = [("k", t, x) for t, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, t long, x double")
    got = croston(df, ["k"], ["t"], "x").orderBy("t").collect()
    want = _croston_ref(xs)
    for r, (z, p, fc) in zip(got, want):
        assert r["z_hat"] == z and r["p_hat"] == p
        if fc is None:
            assert r["forecast"] is None
        else:
            assert r["forecast"] == fc


def test_croston_leading_zeros_give_null_states(spark):
    xs = [0.0, 0.0, 0.0, 7.0]
    df = spark.createDataFrame(
        [("k", t, x) for t, x in enumerate(xs)], "k string, t long, x double"
    )
    got = croston(df, ["k"], ["t"], "x").orderBy("t").collect()
    assert all(r["z_hat"] is None for r in got[:3])
    # first demand after 3 zero periods seeds p = 4
    assert got[3]["z_hat"] == 7.0 and got[3]["p_hat"] == 4.0


def test_croston_query_laws(spark):
    rows = REGISTRY["q_croston_demand"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        if r["z_hat"] is not None:
            assert r["z_hat"] >= 1.0  # demands are counts >= 1
            assert r["p_hat"] >= 1.0  # intervals are >= 1 period
            assert abs(r["forecast"] - round(r["z_hat"] / r["p_hat"], 2)) < 0.5


def test_er_pipeline_invariants(spark):
    rows = REGISTRY["q_er_pipeline"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # every multi-member cluster came from >= 1 match edge and
        # contains at least one master record (edges are a-b only)
        assert r["n_members"] >= 2
        assert 1 <= r["n_master"] < r["n_members"]
        assert r["canonical_id"] is not None
        assert r["cluster_id"] <= r["canonical_id"]
    # intact records (name survives + seg or bal survives) must link:
    # the match rate over 1500 masters is ~0.9*(1-0.01) — sanity band
    n_masters = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert 0.7 * n_masters <= sum(r["n_members"] - 1 for r in rows) <= n_masters
