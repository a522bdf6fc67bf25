"""Z-order layout → real file skipping: per-file footer spans shrink
under `layout_zorder` and a selective filter touches a small fraction
of the files — the end-to-end evidence for the data-layout claim in
SCALE.md (not just the Morton arithmetic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.maintenance import parquet_file_stats
from jibaro_spark.operators.relational import layout_zorder

N_FILES = 16
DOMAIN = 256


def _keyed(spark):
    # a shuffled 2-D grid: both keys uniform, uncorrelated
    return (
        spark.range(DOMAIN * DOMAIN)
        .select(
            (F.col("id") % DOMAIN).alias("x"),
            (F.pmod(F.xxhash64("id"), F.lit(DOMAIN))).alias("y"),
            F.col("id").alias("payload"),
        )
    )


def _avg_span(stats, col):
    spans = [r[f"{col}_max"] - r[f"{col}_min"] for r in stats]
    return sum(spans) / len(spans)


def test_zorder_layout_shrinks_file_spans_and_prunes(spark, tmp_path):
    df = _keyed(spark)
    plain_dir, z_dir = str(tmp_path / "plain"), str(tmp_path / "zorder")
    df.repartition(N_FILES).write.parquet(plain_dir)
    layout_zorder(df, "x", "y", num_partitions=N_FILES).write.parquet(z_dir)

    plain = parquet_file_stats(plain_dir, ["x", "y"])
    zed = parquet_file_stats(z_dir, ["x", "y"])
    assert len(zed) == N_FILES
    # round-robin files each cover ~the whole domain on both keys;
    # z-ordered files are bounded in BOTH keys
    for col in ("x", "y"):
        assert _avg_span(plain, col) > 0.9 * DOMAIN
        assert _avg_span(zed, col) < 0.45 * DOMAIN, (
            f"{col}: z-ordered per-file span must shrink "
            f"({_avg_span(zed, col):.0f} vs domain {DOMAIN})"
        )

    # end-to-end skipping: a selective predicate on EITHER key touches
    # few z-ordered files (rows survive only in files whose span covers
    # the value) but every round-robin file
    for col in ("x", "y"):
        touched_z = (
            spark.read.parquet(z_dir)
            .filter(F.col(col) == 7)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        touched_plain = (
            spark.read.parquet(plain_dir)
            .filter(F.col(col) == 7)
            .select(F.input_file_name())
            .distinct()
            .count()
        )
        assert touched_plain == N_FILES
        assert touched_z <= N_FILES // 2, f"{col}: touched {touched_z} files"


def test_parquet_file_stats_shapes(spark, tmp_path):
    d = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(2).write.parquet(d)
    stats = parquet_file_stats(d, ["k", "v"])
    assert stats and all(r["num_rows"] > 0 for r in stats)
    assert sum(r["num_rows"] for r in stats) == 100
    for r in stats:
        assert r["k_min"] <= r["k_max"]
        assert r["v_min"] == 2 * r["k_min"] and r["v_max"] == 2 * r["k_max"]


def test_optimize_zorder_rewrites_in_place(spark, tmp_path):
    from jibaro_spark.maintenance import optimize_zorder

    d = str(tmp_path / "opt")
    _keyed(spark).repartition(8).write.parquet(d)
    before = parquet_file_stats(d, ["x", "y"])
    n = optimize_zorder(spark, d, ["x", "y"], target_file_bytes=24 * 1024)
    after = parquet_file_stats(d, ["x", "y"])
    assert n >= 2 and len(after) == n
    assert sum(r["num_rows"] for r in after) == sum(
        r["num_rows"] for r in before
    )
    assert _avg_span(after, "x") < 0.6 * _avg_span(before, "x")
    assert _avg_span(after, "y") < 0.6 * _avg_span(before, "y")
