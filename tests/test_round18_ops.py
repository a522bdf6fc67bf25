"""Round-18 family tests: incremental top-k branch coverage
(member-delete repair, non-member update entry, insert-only
self-maintenance, emptied/new keys, ties, randomized scratch parity),
sequence-pattern sanity, closeness bounds, and the DW [0,4] range.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from jibaro_spark.operators.cdc import incremental_topk_apply
from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _topk_scratch(rows, k=2):
    """Pure-Python ground truth: per key, top-k by (value desc, id asc)."""
    by_key = {}
    for key, rid, v in rows:
        by_key.setdefault(key, []).append((rid, v))
    out = []
    for key, items in by_key.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for rank, (rid, v) in enumerate(items[:k], start=1):
            out.append((key, rank, rid, float(v)))
    return sorted(out)


def _apply(spark, fact, changes, k=2):
    """Build view from fact, apply changes, return sorted tuples."""
    new_rows = {(key, rid): v for key, rid, v in fact}
    for op, key, rid, before, after in changes:
        if op == "d":
            new_rows.pop((key, rid), None)
        elif op == "u":
            new_rows[(key, rid)] = after
        else:
            new_rows[(key, rid)] = after
    new_fact_rows = [(key, rid, v) for (key, rid), v in new_rows.items()]

    fact_df = spark.createDataFrame(fact, ["k", "id", "v"])
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("id").asc())
    view = (
        fact_df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .select("k", "id", F.col("v").cast("decimal(28,4)").alias("v"))
    )
    ch_df = spark.createDataFrame(
        [(op, key, rid, before, after) for op, key, rid, before, after in changes],
        "op string, k string, id long, before_v double, after_v double",
    )
    nf_df = spark.createDataFrame(
        new_fact_rows, "k string, id long, v double"
    )
    got = incremental_topk_apply(
        view, ch_df, nf_df, keys=["k"], id_col="id", value_col="v", k=k
    )
    out = sorted(
        (r["k"], r["rank"], r["id"], float(r["v"])) for r in got.collect()
    )
    want = _topk_scratch(new_fact_rows, k)
    return out, want


def test_topk_member_delete_promotes_replacement(spark):
    fact = [("a", 1, 10.0), ("a", 2, 9.0), ("a", 3, 8.0), ("a", 4, 7.0)]
    # delete the #1 member: #3 (8.0) must be promoted from the fact
    out, want = _apply(spark, fact, [("d", "a", 1, 10.0, None)])
    assert out == want
    assert ("a", 2, 3, 8.0) in out


def test_topk_nonmember_update_enters(spark):
    fact = [("a", 1, 10.0), ("a", 2, 9.0), ("a", 3, 1.0)]
    # id 3 was below the cut; its update must displace id 2
    out, want = _apply(spark, fact, [("u", "a", 3, 1.0, 9.5)])
    assert out == want
    assert ("a", 2, 3, 9.5) in out and all(t[2] != 2 for t in out)


def test_topk_member_update_rescans(spark):
    fact = [("a", 1, 10.0), ("a", 2, 9.0), ("a", 3, 8.5)]
    # demote the #1 member below everyone: 2,3 move up, 1 drops out
    out, want = _apply(spark, fact, [("u", "a", 1, 10.0, 0.5)])
    assert out == want
    assert out[0][2] == 2


def test_topk_insert_only_self_maintains(spark):
    fact = [("a", 1, 5.0), ("b", 9, 1.0)]
    out, want = _apply(
        spark,
        fact,
        [("c", "a", 2, None, 7.0), ("c", "c", 1, None, 3.0)],
    )
    assert out == want
    assert ("a", 1, 2, 7.0) in out and ("c", 1, 1, 3.0) in out


def test_topk_emptied_key_disappears(spark):
    fact = [("a", 1, 5.0)]
    out, want = _apply(spark, fact, [("d", "a", 1, 5.0, None)])
    assert out == want == []


def test_topk_tie_lower_id_wins(spark):
    fact = [("a", 5, 7.0), ("a", 2, 7.0), ("a", 9, 7.0)]
    out, want = _apply(spark, fact, [("c", "a", 1, None, 7.0)])
    assert out == want
    assert [t[2] for t in sorted(out)] == [1, 2]


def test_topk_randomized_scratch_parity(spark):
    rng = random.Random(18)
    fact = [
        (f"k{rng.randrange(6)}", i, float(rng.randrange(1, 40)))
        for i in range(60)
    ]
    ids = {(k, i) for k, i, _ in fact}
    changes = []
    used = set()
    for k, i, v in fact:
        if (k, i) in used:
            continue
        r = rng.random()
        if r < 0.2:
            changes.append(("d", k, i, v, None))
            used.add((k, i))
        elif r < 0.4:
            changes.append(("u", k, i, v, float(rng.randrange(1, 40))))
            used.add((k, i))
    nxt = 1000
    for _ in range(15):
        k = f"k{rng.randrange(8)}"
        changes.append(("c", k, nxt, None, float(rng.randrange(1, 40))))
        nxt += 1
    out, want = _apply(spark, fact, changes, k=3)
    assert out == want


def test_pattern_counts_sane(spark):
    r = REGISTRY["q_event_pattern_match"].fn(spark, SF).collect()[0]
    assert r["n_users"] > 0
    assert 0 <= r["n_contiguous"] <= r["n_funnel"] <= r["n_users"]
    assert abs(r["funnel_share"] - round(r["n_funnel"] / r["n_users"], 6)) < 1e-9


def test_closeness_bounds(spark):
    rows = REGISTRY["q_closeness_centrality"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # harmonic ≤ n_reached (every term ≤ 1) and ≥ n_reached / 25
        assert 0 <= r["harmonic"] <= r["n_reached"] + 1e-9
        if r["n_reached"]:
            assert r["harmonic"] >= r["n_reached"] / 25 - 1e-9


def test_durbin_watson_range(spark):
    rows = REGISTRY["q_durbin_watson"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["dw"] is None or 0.0 <= r["dw"] <= 4.0
        assert r["n_days"] > 0


def test_mmr_diversify_properties(spark):
    rows = REGISTRY["q_mmr_diversify"].fn(spark, SF).collect()
    assert len(rows) == 3
    by_rank = sorted(rows, key=lambda r: r["rank"])
    # rank 1 is the pure-relevance argmax: its score IS its relevance
    assert abs(by_rank[0]["mmr_score"] - round(by_rank[0]["relevance"], 6)) < 1e-9
    # later picks: score = 0.7·rel − 0.3·maxsim with maxsim ∈ [−1, 1]
    for r in by_rank[1:]:
        assert abs(r["mmr_score"] - 0.7 * r["relevance"]) <= 0.3 + 1e-9
    assert len({r["vec_id"] for r in rows}) == 3
