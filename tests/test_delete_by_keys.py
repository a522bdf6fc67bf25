"""Targeted key deletion: bloom-pruned and stats-pruned file
targeting, exact row semantics, untouched files left byte-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.maintenance import build_bloom_file_index, delete_by_keys


def _scattered(spark, tmp_path, name="t"):
    out = str(tmp_path / name)
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartition(8, "k").write.mode("overwrite").parquet(out)
    return out


def test_delete_bloom_pruned_rewrites_few_files(spark, tmp_path):
    out = _scattered(spark, tmp_path)
    build_bloom_file_index(spark, out, "k")
    before_files = set(spark.read.parquet(out).inputFiles())
    stats = delete_by_keys(spark, out, "k", [123, 456])
    assert stats["rows_deleted"] == 2
    assert stats["files_total"] == 8
    assert stats["files_rewritten"] <= 3  # 1-2 true files + rare FPs
    after = spark.read.parquet(out)
    assert after.count() == 3998
    assert after.filter(F.col("k").isin([123, 456])).count() == 0
    # untouched files survive with identical paths
    after_files = set(after.inputFiles())
    untouched = before_files & after_files
    assert len(untouched) >= 8 - stats["files_rewritten"]


def test_delete_stats_pruned_on_clustered_table(spark, tmp_path):
    out = str(tmp_path / "clustered")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartitionByRange(8, "k").write.mode("overwrite").parquet(out)
    stats = delete_by_keys(spark, out, "k", [10, 20, 30])
    assert stats["rows_deleted"] == 3
    assert stats["files_rewritten"] < 8  # min/max pruning kicked in
    assert spark.read.parquet(out).count() == 3997


def test_delete_unprunable_falls_back_but_stays_exact(spark, tmp_path):
    out = _scattered(spark, tmp_path, "fallback")
    # no bloom index; hash-scattered → min/max covers everything
    stats = delete_by_keys(spark, out, "k", [7])
    assert stats["rows_deleted"] == 1
    after = spark.read.parquet(out)
    assert after.count() == 3999
    assert after.filter(F.col("k") == 7).count() == 0
    # full-scan values unchanged for a survivor
    assert after.filter(F.col("k") == 8).collect()[0]["v"] == 8 % 97


def test_delete_absent_keys_noop_rows(spark, tmp_path):
    out = _scattered(spark, tmp_path, "absent")
    build_bloom_file_index(spark, out, "k")
    stats = delete_by_keys(spark, out, "k", [999_999])
    assert stats["rows_deleted"] == 0
    assert spark.read.parquet(out).count() == 4000
