"""Unit tests: catalog/config path conventions (M0), relational helper
operators, salted join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jibaro_spark.catalog import Catalog, Layer, TableRef
from jibaro_spark.config import Settings
from jibaro_spark.operators.relational import salted_join, top_k_per_group


def test_catalog_paths():
    cat = Catalog(Settings(protocol="s3a"))
    ref = TableRef(str(Layer.CURATED), "proj", "db", "tbl")
    assert cat.path(ref) == "s3a://curated/proj/db/tbl"
    assert (
        cat.checkpoint_path(ref)
        == "s3a://spark-control/_checkpoint/curated/proj/db/tbl"
    )
    assert cat.history_path(ref) == "s3a://spark-control/_history/curated/proj/db/tbl"


def test_catalog_file_protocol(tmp_path):
    cat = Catalog(Settings(protocol="file", base_path=str(tmp_path)))
    ref = cat.ref(Layer.RAW, "p", "d", "t")
    assert cat.path(ref) == f"{tmp_path}/raw/p/d/t"


def test_tableref_validation():
    with pytest.raises(ValueError):
        TableRef("raw", "a/b", "db", "t")
    with pytest.raises(ValueError):
        TableRef("raw", "", "db", "t")
    assert TableRef("raw", "p", "d", "t").with_layer(Layer.STAGED).layer == "staged"


def test_settings_env_and_toml(tmp_path):
    toml = tmp_path / "s.toml"
    toml.write_text('protocol = "s3a"\ncompact_min_files = 5\n')
    s = Settings.load(str(toml), env={"JIBARO_SPARK_VACUUM_RETENTION_HOURS": "24"})
    assert s.protocol == "s3a"
    assert s.compact_min_files == 5
    assert s.vacuum_retention_hours == 24
    with pytest.raises(ValueError):
        s.bucket_for("nope")


def test_salted_join_equals_plain_join(spark):
    """Salting must be semantically invisible — identical rows to the
    plain join, with the hot key spread across salt buckets."""
    left = spark.range(0, 2000).select(
        (F.when(F.col("id") % 10 != 0, F.col("id") % 50).otherwise(7)).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)], "k long, name string"
    )
    plain = sorted((r.k, r.v, r.name) for r in left.join(right, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(left, right, "k", "k", salt=8).drop(right.k).collect()
    )
    assert salted == plain


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)], "g string, x int"
    )
    got = {
        (r.g, r.x)
        for r in top_k_per_group(df, ["g"], [F.col("x").desc()], k=2).collect()
    }
    assert got == {("a", 3), ("a", 2), ("b", 9), ("b", 8)}


def test_exact_quantiles_both_forms_match_builtin(spark):
    import random

    from pyspark.sql import functions as F

    from jibaro_spark.operators.relational import (
        exact_quantiles,
        exact_quantiles_bucketed,
    )

    rng = random.Random(7)
    rows = [
        (g, round(rng.uniform(0, 1000), 2) if g != "c" else 42.0)
        for g in ("a", "b", "c")
        for _ in range(997)
    ] + [("d", 5.0)]  # constant group + singleton group edge cases
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
    probs = [(0.5, "p50"), (0.95, "p95"), (0.01, "p01")]
    expected = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {p})").alias(name)
                for p, name in probs
            ]
        )
        .collect()
    }
    for fn in (exact_quantiles, exact_quantiles_bucketed):
        got = {r["g"]: r for r in fn(df, ["g"], "v", probs).collect()}
        assert set(got) == set(expected), fn.__name__
        for g, row in expected.items():
            for _, name in probs:
                assert got[g][name] == pytest.approx(row[name], abs=1e-9), (
                    fn.__name__,
                    g,
                    name,
                )


def test_partitioned_prefix_sum_matches_global_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from jibaro_spark.operators.relational import partitioned_prefix_sum

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("v")
    ).repartition(8)
    got = {
        r.id: r.cum
        for r in partitioned_prefix_sum(df, "id", "v", chunk_width=64).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    expected = {r.id: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == expected
