"""Round-5 hardening tests: null-contract pinning for the window
queries (VERDICT r4 §wrong #2 / ADVICE), _ship_package diagnosability,
seed_centroids sparse/non-numeric guards, and the proto index
truncated-scan marker."""

from __future__ import annotations

import logging
import os
import shutil

import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from jibaro_spark.queries import REGISTRY
from jibaro_spark.testing import compare_with_oracle

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nulled_events_dir(tmp_path_factory):
    """A fixture dir whose events table has NULLs injected into value
    (every 37th row) and ts (every 41st row) — the exact rows whose
    handling differs between Spark (collect_list drops NULL values;
    null ts groups into a null window) and DuckDB (list() keeps NULLs;
    the hop-unroll WHERE drops null ts) unless both query sides filter
    explicitly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nulled_sf")
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    pdf = t.to_pandas()
    pdf.loc[pdf.index % 37 == 0, "value"] = None
    pdf.loc[pdf.index % 41 == 0, "ts"] = None
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q_ewma_events",
        "q_sliding_windows",
        "q_markov_transitions",
        "q_burst_dedup",
        "q_rfm_segments",
        "q_mad_outliers",
        "q_type_jaccard",
    ],
)
def test_null_injected_oracle_match(name, spark, nulled_events_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{nulled_events_dir}/events.parquet'"
    )
    try:
        dq = REGISTRY[name]
        df = dq.fn(spark, nulled_events_dir)
        compare_with_oracle(df, con, dq.oracle)
    finally:
        con.close()


def test_ship_package_logs_on_failure(spark, monkeypatch, caplog):
    from jibaro_spark import session as S

    def boom(*a, **k):
        raise OSError("forced archive failure")

    monkeypatch.setattr(shutil, "make_archive", boom)
    monkeypatch.setattr(spark, "_jibaro_pkg_shipped", False, raising=False)
    with caplog.at_level(logging.WARNING, logger="jibaro_spark.session"):
        S._ship_package(spark)
    assert any(
        "addPyFile" in r.message and "forced archive failure" in r.message
        for r in caplog.records
    ), "failed addPyFile must be logged, not swallowed (VERDICT r4 #3)"


def test_seed_centroids_sparse_ids(spark):
    """A sparse id domain (huge gaps) under-fills the modulo filter;
    the guard must still return exactly k seeds (ADVICE r4)."""
    from jibaro_spark.operators.similarity import seed_centroids

    rows = [(i * 10_000_019 + 7, [float(i), float(i % 3)]) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    seeds = seed_centroids(df, "id", "vec", 6)
    assert len(seeds) == 6
    assert all(len(s) == 2 for s in seeds)
    # deterministic across invocations
    assert seeds == seed_centroids(df, "id", "vec", 6)


def test_seed_centroids_string_ids(spark):
    """Non-numeric ids must not hit the arithmetic/pmod path; the
    hash-ordered top-k fallback returns exactly k seeds."""
    from jibaro_spark.operators.similarity import seed_centroids

    rows = [(f"doc-{i:04d}", [float(i)]) for i in range(30)]
    df = spark.createDataFrame(rows, "id string, vec array<float>")
    seeds = seed_centroids(df, "id", "vec", 5)
    assert len(seeds) == 5
    assert seeds == seed_centroids(df, "id", "vec", 5)


def test_seed_centroids_shortfall_raises(spark):
    from jibaro_spark.operators.similarity import seed_centroids

    df = spark.createDataFrame(
        [(1, [1.0]), (2, [2.0])], "id long, vec array<float>"
    )
    with pytest.raises(ValueError, match="need 5 rows"):
        seed_centroids(df, "id", "vec", 5)


def test_proto_index_truncated_scan_marker(spark):
    """A deep multi-byte index section longer than max_scan yields a
    null index list AND a True truncated marker (so the caller can
    retry with a wider bound); a genuinely short frame yields null
    with a False marker (real corruption)."""
    from pyspark.sql import functions as F

    from jibaro_spark.codecs.confluent import (
        proto_index_bytes,
        proto_index_scan_truncated,
        proto_message_indexes,
    )

    header = b"\x00\x00\x00\x00\x2a"  # magic + schema id 42
    deep = list(range(300, 312))  # 12 indexes, all 2-byte varints
    deep_frame = header + proto_index_bytes(deep) + b"payload"
    short_frame = header + b"\x84"  # continuation bit set, then EOF
    df = spark.createDataFrame(
        [(1, deep_frame), (2, short_frame)], "i int, value binary"
    )
    out = (
        df.select(
            "i",
            proto_message_indexes("value", max_scan=4).alias("idx4"),
            proto_index_scan_truncated("value", max_scan=4).alias("trunc4"),
            proto_message_indexes("value", max_scan=32).alias("idx32"),
        )
        .orderBy("i")
        .collect()
    )
    assert out[0]["idx4"] is None and out[0]["trunc4"] is True
    assert list(out[0]["idx32"]) == deep  # wider bound recovers the row
    assert out[1]["idx4"] is None and out[1]["trunc4"] is False


def test_bucketed_overwrite_qualified_and_repeat(spark, tmp_path):
    """write_bucketed_table overwrite must be repeatable (location
    resolved via the catalog, not assumed under <warehouse>/<name>)."""
    from jibaro_spark.io import write_bucketed_table

    df = spark.range(100).withColumnRenamed("id", "k")
    for _ in range(2):  # second write exercises the resolved-location delete
        write_bucketed_table(df, "jb_r5_bucket_probe", ["k"], num_buckets=4)
    assert spark.table("jb_r5_bucket_probe").count() == 100
    spark.sql("DROP TABLE IF EXISTS jb_r5_bucket_probe")


def test_profile_table_counts_nulls_and_distincts(spark):
    from jibaro_spark.operators.dq import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")], ["x", "s"]
    )
    got = {r.col_name: r for r in profile_table(df).collect()}
    assert set(got) == {"x", "s"}
    assert (got["x"].n_rows, got["x"].n_nulls, got["x"].n_distinct) == (4, 1, 2)
    assert (got["x"].min_value, got["x"].max_value) == ("1", "2")
    assert (got["s"].n_rows, got["s"].n_nulls, got["s"].n_distinct) == (4, 1, 2)
    # column subset profiles only the requested columns
    only = profile_table(df, ["s"]).collect()
    assert [r.col_name for r in only] == ["s"]


def test_global_row_number_matches_window_row_number(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.relational import global_row_number

    df = spark.range(1000).select(
        (F.col("id") * 37 % 501).alias("k"), F.col("id").alias("tie")
    )
    got = {
        (r.k, r.tie): r["__rn"]
        for r in global_row_number(df, ["k", "tie"], num_partitions=7).collect()
    }
    rows = sorted(((r.k, r.tie) for r in df.collect()))
    expected = {kt: i + 1 for i, kt in enumerate(rows)}
    assert got == expected


@pytest.mark.parametrize(
    "n,k", [(1000, 8), (17, 5), (5, 8), (999, 10), (1, 3), (8, 8), (9, 8)]
)
def test_ntile_exact_matches_native_ntile(spark, n, k):
    """Bucket-for-bucket parity with Spark's (single-partition) native
    ntile window, including the n % k remainder distribution and the
    n < k degenerate case."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from jibaro_spark.operators.relational import ntile_exact

    df = spark.range(n).select(
        (F.col("id") * 17 % 97).alias("v"), F.col("id").alias("tie")
    )
    native = {
        (r.v, r.tie): r.b
        for r in df.select(
            "v", "tie", F.ntile(k).over(Window.orderBy("v", "tie")).alias("b")
        ).collect()
    }
    got = {
        (r.v, r.tie): r["__ntile"]
        for r in ntile_exact(df, k, ["v", "tie"], num_partitions=6).collect()
    }
    assert got == native


def test_global_row_number_and_ntile_empty_and_guards(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.relational import global_row_number, ntile_exact

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert global_row_number(empty, ["k"]).count() == 0
    assert ntile_exact(empty, 4, ["k"]).count() == 0
    with pytest.raises(ValueError, match="k must be >= 1"):
        ntile_exact(empty, 0, ["k"])


def test_edit_distance_join_requires_candidate_strategy(spark):
    """The unbounded cross product is opt-in only (VERDICT r5 §Wrong-2)."""
    from jibaro_spark.operators.dedup import edit_distance_join

    df = spark.createDataFrame([(1, "abc")], "id long, s string")
    b = df.select(F.col("id").alias("id2"), F.col("s").alias("s2"))
    with pytest.raises(ValueError, match="candidate strategy"):
        edit_distance_join(df, b, "id", "id2", "s", "s2", max_dist=1)
    # explicit opt-in still works for tiny inputs
    out = edit_distance_join(
        df, b, "id", "id2", "s", "s2", max_dist=1, allow_cross_join=True
    )
    assert out.count() == 1


def test_edit_distance_qgram_mode_is_lossless(spark):
    """qgram signature candidates reproduce the cross-join answer
    exactly — the prefix-filter guarantee, pinned on strings with
    shared universal grams (padding, common prefixes)."""
    from jibaro_spark.operators.dedup import edit_distance_join

    words = [
        "kitten", "sitten", "sittin", "mitten", "smitten",
        "flask", "flash", "flush", "brush", "crush",
        "abc", "abd", "xbc", "a", "", "zzzzz",
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id long, s string"
    )
    b = df.select(F.col("id").alias("id2"), F.col("s").alias("s2"))
    for k in (1, 2):
        exact = {
            (r["id"], r["id2"], r["dist"])
            for r in edit_distance_join(
                df, b, "id", "id2", "s", "s2", max_dist=k,
                allow_cross_join=True,
            ).collect()
        }
        sig = {
            (r["id"], r["id2"], r["dist"])
            for r in edit_distance_join(
                df, b, "id", "id2", "s", "s2", max_dist=k, qgram=2
            ).collect()
        }
        assert sig == exact
