"""Round-10 family tests: join-view IVM (incremental_join_apply)
semantics pinned against a scratch recompute, the mergeability law of
the fixed-bin histogram sketch, keep-best invariants of the end-to-end
MinHash dedup pipeline, and plan-shape assertions (no cartesian beyond
1-row scalar broadcasts) for the new queries.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from jibaro_spark.operators.cdc import incremental_join_apply
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# incremental_join_apply — apply(fact ⋈ dim, Δ, dim) == fact′ ⋈ dim


def _fixture(spark):
    fact = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200), (3, 10, 300), (4, 30, 400)],
        "k long, ck long, amt long",
    )
    dim = spark.createDataFrame(
        [(10, "US"), (20, "BR"), (30, "DE")], "ck long, nation string"
    )
    view = fact.join(dim, "ck").select("k", "ck", "nation", "amt")
    return fact, dim, view


def _as_set(df):
    return {tuple(r) for r in df.select("k", "ck", "nation", "amt").collect()}


def test_join_ivm_matches_scratch_recompute(spark):
    fact, dim, view = _fixture(spark)
    changes = spark.createDataFrame(
        [
            (2, 20, 0, "d"),      # delete k=2
            (3, 10, 999, "u"),    # update k=3 amount
            (5, 30, 500, "c"),    # insert new row
        ],
        "k long, ck long, amt long, op string",
    )
    got = incremental_join_apply(view, changes, dim, "k", "ck")
    fact1 = spark.createDataFrame(
        [(1, 10, 100), (3, 10, 999), (4, 30, 400), (5, 30, 500)],
        "k long, ck long, amt long",
    )
    want = fact1.join(dim, "ck").select("k", "ck", "nation", "amt")
    assert _as_set(got) == _as_set(want)


def test_join_ivm_update_moves_join_key(spark):
    """An update that changes the fact's foreign key must re-enrich
    through the dimension — old view row dropped, new one joined."""
    fact, dim, view = _fixture(spark)
    changes = spark.createDataFrame(
        [(1, 30, 100, "u")], "k long, ck long, amt long, op string"
    )
    got = incremental_join_apply(view, changes, dim, "k", "ck")
    assert (1, 30, "DE", 100) in _as_set(got)
    assert not any(r[0] == 1 and r[2] == "US" for r in _as_set(got))


def test_join_ivm_insert_missing_dim_key_drops_row(spark):
    """Inner-join semantics: a change row whose join key has no
    dimension match contributes nothing (matching the scratch join)."""
    fact, dim, view = _fixture(spark)
    changes = spark.createDataFrame(
        [(9, 99, 900, "c")], "k long, ck long, amt long, op string"
    )
    got = incremental_join_apply(view, changes, dim, "k", "ck")
    assert _as_set(got) == _as_set(view)


def test_join_ivm_delete_only(spark):
    fact, dim, view = _fixture(spark)
    changes = spark.createDataFrame(
        [(4, 30, 0, "d")], "k long, ck long, amt long, op string"
    )
    got = incremental_join_apply(view, changes, dim, "k", "ck")
    assert _as_set(got) == {t for t in _as_set(view) if t[0] != 4}


def test_join_ivm_never_rejoins_stored_view(spark):
    """Scale contract: the stored view participates only in the keyed
    anti-join — the plan's join against the dimension must have the
    |Δ|-bounded change batch, not the view, as its probe side.  We pin
    it structurally: with an empty change batch the result is the view
    untouched (no join against dim at all in the data)."""
    fact, dim, view = _fixture(spark)
    empty = spark.createDataFrame([], "k long, ck long, amt long, op string")
    got = incremental_join_apply(view, empty, dim, "k", "ck")
    assert _as_set(got) == _as_set(view)


# ---------------------------------------------------------------------------
# Histogram sketch mergeability: hist(A ∪ B) == hist(A) + hist(B)
# elementwise — the property that makes the 100 TB plan (per-split
# integer bin counts, merged by addition) correct.


def test_histogram_bins_merge_by_addition(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    b = o.select(cents.alias("c"), (F.col("o_orderkey") % 2 == 0).alias("half"))
    binned = b.withColumn(
        "bin", F.expr("least((c * 1024) div 60000000, 1023)")
    )
    whole = {
        r["bin"]: r["cnt"]
        for r in binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    parts = (
        binned.groupBy("half", "bin").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    merged: dict = {}
    for r in parts:
        merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == whole


# ---------------------------------------------------------------------------
# End-to-end minhash dedup invariants


@pytest.fixture(scope="module")
def mhc_rows(spark):
    return REGISTRY["q_minhash_dedup_clusters"].fn(spark, SF).collect()


def test_minhash_clusters_keep_exactly_one_per_cluster(mhc_rows):
    by_cluster: dict = {}
    for r in mhc_rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rows in by_cluster.items():
        keeps = [r for r in rows if r["keep"]]
        assert len(keeps) == 1, f"cluster {cid}: {len(keeps)} keepers"
        assert len(rows) == rows[0]["cluster_size"]


def test_minhash_clusters_cover_all_docs(spark, mhc_rows):
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(mhc_rows) == n_docs
    assert len({r["doc_id"] for r in mhc_rows}) == n_docs


def test_minhash_cluster_id_is_min_member(mhc_rows):
    by_cluster: dict = {}
    for r in mhc_rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


# ---------------------------------------------------------------------------
# Plan shape: the only cartesian products allowed in the round-10
# queries are 1-row scalar broadcasts (the AdaBoost stump / weight
# scalars).  Anything joining two unbounded sides via
# CartesianProduct is a scale defect.


@pytest.mark.parametrize(
    "qname",
    [
        "q_hist_quantile_sketch",
        "q_minhash_dedup_clusters",
        "q_incremental_join",
        "q_adaboost_round",
    ],
)
def test_round10_no_cartesian(spark, qname):
    plan = REGISTRY[qname].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
