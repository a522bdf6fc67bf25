"""Per-file Bloom index: point lookups skip files min/max stats
cannot prune (hash-scattered keys), with exact filter parity, zero
false negatives over every present key, sidecar invisibility to
plain readers, and string-key support.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jibaro_spark.maintenance import build_bloom_file_index, read_bloom_pruned


def _hash_scattered_table(spark, tmp_path):
    """8 files hash-partitioned on k: every file's (min,max) spans
    ~the full domain, so min/max skipping is useless — the Bloom
    index is the only thing that can prune a point probe."""
    out = str(tmp_path / "scattered")
    df = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    df.repartition(8, "k").write.mode("overwrite").parquet(out)
    return out, df


def test_bloom_pruned_point_lookup_skips_files(spark, tmp_path):
    out, df = _hash_scattered_table(spark, tmp_path)
    build_bloom_file_index(spark, out, "k")
    pruned = read_bloom_pruned(spark, out, "k", 1234)
    assert [(r["k"], r["v"]) for r in pruned.collect()] == [(1234, 1234 % 97)]
    n_read = len(pruned.inputFiles())
    n_all = len(spark.read.parquet(out).inputFiles())
    assert n_all == 8
    # a point probe hits the 1 file holding the key (plus rare FP files)
    assert n_read <= 2, f"bloom pruned nothing ({n_read}/{n_all})"


def test_bloom_no_false_negatives_over_sample(spark, tmp_path):
    out, df = _hash_scattered_table(spark, tmp_path)
    build_bloom_file_index(spark, out, "k")
    for probe in (0, 7, 997, 1501, 3999):
        got = read_bloom_pruned(spark, out, "k", probe).count()
        assert got == 1, f"lost key {probe}"


def test_bloom_absent_key_reads_nothing_or_filters_exactly(spark, tmp_path):
    out, df = _hash_scattered_table(spark, tmp_path)
    build_bloom_file_index(spark, out, "k")
    pruned = read_bloom_pruned(spark, out, "k", 999_999)
    assert pruned.count() == 0
    assert pruned.columns == ["k", "v"]


def test_bloom_sidecar_invisible_to_plain_read(spark, tmp_path):
    out, df = _hash_scattered_table(spark, tmp_path)
    build_bloom_file_index(spark, out, "k")
    # the _bloom dir must not leak into a normal table read
    assert spark.read.parquet(out).count() == 4000
    assert spark.read.parquet(out).columns == ["k", "v"]


def test_bloom_string_keys(spark, tmp_path):
    out = str(tmp_path / "strtab")
    df = spark.range(0, 2000).select(
        F.concat(F.lit("user-"), F.col("id")).alias("name"),
        F.col("id").alias("v"),
    )
    df.repartition(6, "name").write.mode("overwrite").parquet(out)
    build_bloom_file_index(spark, out, "name")
    pruned = read_bloom_pruned(spark, out, "name", "user-777")
    rows = pruned.collect()
    assert len(rows) == 1 and rows[0]["v"] == 777
    assert len(pruned.inputFiles()) <= 2
