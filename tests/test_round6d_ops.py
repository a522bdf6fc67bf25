"""Round-6d operator tests: bloom-filter join pruning.

What these pin down, beyond the driver's oracle hash (which only
proves the final answers are exact):

* no false NEGATIVES — every built key passes its own filter (the
  bloom membership guarantee the semi/anti exactness rests on);
* the prefilter actually PRUNES (a filter that passes everything is
  exact too — and useless);
* exactness against the plain joins on real tables, both semi and
  anti, including the empty-dimension edge;
* the build collect is bounded by ``num_bits/64``, not by key count.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jibaro_spark.operators.bloom import (
    bloom_build,
    bloom_join,
    bloom_might_contain,
)

SF = "/root/testdata/sf0.001"


def test_no_false_negatives_on_built_keys(spark):
    keys = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build(keys, "k", num_bits=1 << 14, num_hashes=5)
    assert len(words) == (1 << 14) // 64
    survivors = keys.filter(
        bloom_might_contain(F.col("k"), words, num_bits=1 << 14, num_hashes=5)
    ).count()
    assert survivors == 5000


def test_prefilter_prunes_nonmembers(spark):
    # Members: 0..999.  Probes: 100k disjoint keys.  With m=2^16,
    # n=1000, k=5 the fp rate is ~(1-e^{-5000/65536})^5 ≈ 2e-6 — the
    # probe side must shrink by orders of magnitude.
    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    probes = spark.range(1_000_000, 1_100_000).select(F.col("id").alias("k"))
    words = bloom_build(members, "k")
    passed = probes.filter(bloom_might_contain(F.col("k"), words)).count()
    assert passed < 100  # ~0 expected; 100 = 1000× the expected count


@pytest.mark.parametrize("how", ["left_semi", "left_anti"])
def test_bloom_join_equals_plain_join(spark, how):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet").filter(F.col("p_size") >= 45)
    got = (
        bloom_join(li, part, "l_partkey", "p_partkey", how)
        .select("l_orderkey", "l_linenumber")
        .sort("l_orderkey", "l_linenumber")
        .collect()
    )
    want = (
        li.join(
            part.select("p_partkey").distinct(),
            li.l_partkey == F.col("p_partkey"),
            how,
        )
        .select("l_orderkey", "l_linenumber")
        .sort("l_orderkey", "l_linenumber")
        .collect()
    )
    assert got == want


def test_empty_dimension(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = spark.read.parquet(f"{SF}/part.parquet").filter(F.lit(False))
    n = li.count()
    assert bloom_join(li, part, "l_partkey", "p_partkey", "left_semi").count() == 0
    assert bloom_join(li, part, "l_partkey", "p_partkey", "left_anti").count() == n


def test_string_keys_and_bad_args(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["k"])
    words = bloom_build(df, "k", num_bits=1024)
    kept = df.filter(bloom_might_contain(F.col("k"), words, num_bits=1024)).count()
    assert kept == 3
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(df, "k", num_bits=100)
    with pytest.raises(ValueError, match="left_semi or left_anti"):
        bloom_join(df, df, "k", "k", "inner")
    # a probe against a filter built at a DIFFERENT num_bits must fail
    # loudly (out-of-range element_at → NULL predicate → silent row
    # drops, i.e. false negatives) instead of silently dropping rows
    with pytest.raises(ValueError, match="different num_bits"):
        bloom_might_contain(F.col("k"), words, num_bits=2048)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_might_contain(F.col("k"), words, num_bits=100)


from hypothesis import given, settings, strategies as st

FEW = settings(max_examples=5, deadline=None, derandomize=True)


@FEW
@given(
    keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40),
                  min_size=1, max_size=200, unique=True),
    num_bits=st.sampled_from([256, 1024, 1 << 14]),
    num_hashes=st.integers(min_value=1, max_value=8),
)
def test_property_no_false_negatives(spark, keys, num_bits, num_hashes):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    words = bloom_build(df, "k", num_bits=num_bits, num_hashes=num_hashes)
    survivors = df.filter(
        bloom_might_contain(
            F.col("k"), words, num_bits=num_bits, num_hashes=num_hashes
        )
    ).count()
    assert survivors == len(keys)


def test_bloom_probe_composes_with_structured_streaming(spark, tmp_path):
    """The probe predicate is a plain codegen Column, so it drops into
    a readStream filter unchanged — the stream-static prefilter shape
    (static dim builds the filter once; every micro-batch prunes
    map-only, no stream-static join state)."""
    src = str(tmp_path / "li_stream")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    li.repartition(2).write.mode("overwrite").parquet(src)

    part = spark.read.parquet(f"{SF}/part.parquet").filter(F.col("p_size") >= 45)
    words = bloom_build(part, "p_partkey")

    schema = spark.read.parquet(src).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .filter(bloom_might_contain(F.col("l_partkey"), words))
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("bloom_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql(
        "SELECT count(*) AS n FROM bloom_stream"
    ).collect()[0]["n"]
    batch = li.filter(bloom_might_contain(F.col("l_partkey"), words)).count()
    assert streamed == batch
    assert batch < li.count()  # it pruned
