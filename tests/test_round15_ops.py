"""Round-15 family tests: incremental_distinct_apply branch semantics
(multiplicity accounting under inserts/deletes, over-delete clamp,
view parity with scratch recompute) and the stats-pruned read (actual
file skipping on a clustered table, exact result parity, conservative
keep without stats, empty-prune schema stability).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.maintenance import read_pruned
from jibaro_spark.operators.cdc import incremental_distinct_apply


def _aux(spark, rows):
    return spark.createDataFrame(rows, "g string, v long, mult long")


def _chg(spark, rows):
    return spark.createDataFrame(rows, "g string, v long, op string")


def _as_map(df):
    return {(r["g"], r["v"]): r["mult"] for r in df.collect()}


def test_distinct_ivm_delete_of_last_occurrence_drops_value(spark):
    aux = _aux(spark, [("a", 1, 1), ("a", 2, 2)])
    out = incremental_distinct_apply(aux, _chg(spark, [("a", 1, "d")]), "g", "v")
    assert _as_map(out) == {("a", 2): 2}


def test_distinct_ivm_delete_of_duplicated_value_keeps_it(spark):
    aux = _aux(spark, [("a", 2, 2)])
    out = incremental_distinct_apply(aux, _chg(spark, [("a", 2, "d")]), "g", "v")
    assert _as_map(out) == {("a", 2): 1}


def test_distinct_ivm_insert_new_and_existing(spark):
    aux = _aux(spark, [("a", 1, 1)])
    out = incremental_distinct_apply(
        aux, _chg(spark, [("a", 1, "c"), ("a", 9, "c"), ("b", 9, "c")]), "g", "v"
    )
    assert _as_map(out) == {("a", 1): 2, ("a", 9): 1, ("b", 9): 1}


def test_distinct_ivm_overdelete_clamps_to_drop(spark):
    aux = _aux(spark, [("a", 1, 1)])
    out = incremental_distinct_apply(
        aux, _chg(spark, [("a", 1, "d"), ("a", 1, "d")]), "g", "v"
    )
    assert _as_map(out) == {}


def test_distinct_ivm_matches_scratch_recompute(spark):
    import random

    rng = random.Random(7)
    facts = [("g%d" % rng.randint(0, 2), rng.randint(0, 9)) for _ in range(300)]
    fact_df = spark.createDataFrame(facts, "g string, v long")
    aux0 = fact_df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("mult"))
    # delete the first occurrence-list third, insert some new values
    dels = [(g, v, "d") for g, v in facts[:100]]
    ins = [("g0", 100 + i, "c") for i in range(5)]
    out = incremental_distinct_apply(aux0, _chg(spark, dels + ins), "g", "v")
    got = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from collections import Counter

    c = Counter(facts)
    for g, v, _ in dels:
        c[(g, v)] -= 1
    for g, v, _ in ins:
        c[(g, v)] += 1
    want: dict = {}
    for (g, v), m in c.items():
        if m > 0:
            want[g] = want.get(g, 0) + 1
    assert got == want


# ---------------------------------------------------------------------------
# Stats-pruned read


def _clustered_table(spark, tmp_path):
    out = str(tmp_path / "clustered")
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    # range-partition on k → 8 files, each covering a disjoint k range
    df.repartitionByRange(8, "k").write.mode("overwrite").parquet(out)
    return out, df


def test_read_pruned_skips_files_and_matches_full_scan(spark, tmp_path):
    out, df = _clustered_table(spark, tmp_path)
    pruned = read_pruned(spark, out, {"k": (2000, 2500)})
    want = {
        (r["k"], r["v"])
        for r in df.filter((F.col("k") >= 2000) & (F.col("k") <= 2500)).collect()
    }
    got = {(r["k"], r["v"]) for r in pruned.collect()}
    assert got == want
    n_read = len(pruned.inputFiles())
    n_all = len(spark.read.parquet(out).inputFiles())
    assert n_all == 8
    assert n_read < n_all, f"no files pruned ({n_read}/{n_all})"


def test_read_pruned_half_open_bounds(spark, tmp_path):
    out, df = _clustered_table(spark, tmp_path)
    pruned = read_pruned(spark, out, {"k": (9000, None)})
    assert pruned.count() == 1000
    assert len(pruned.inputFiles()) < 8


def test_read_pruned_empty_range_keeps_schema(spark, tmp_path):
    out, df = _clustered_table(spark, tmp_path)
    pruned = read_pruned(spark, out, {"k": (50000, 60000)})
    assert pruned.count() == 0
    assert pruned.columns == ["k", "v"]


def test_read_pruned_unclustered_column_keeps_all_files_but_filters(spark, tmp_path):
    """v cycles through every file (0..96 everywhere) → no file can be
    pruned on v, but the residual filter still applies exactly."""
    out, df = _clustered_table(spark, tmp_path)
    pruned = read_pruned(spark, out, {"v": (5, 5)})
    assert len(pruned.inputFiles()) == 8  # conservative: nothing pruned
    assert pruned.count() == df.filter(F.col("v") == 5).count()
