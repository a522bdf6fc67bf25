"""I/O surface tests (SURVEY §2.1 S1-S4, §2.2 K1): batch round-trips
for every path-mounted format by table coordinates, plus streaming read
with schema inference — including csv, which the reference's batch
writer lacked (SURVEY §2.13)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jibaro_spark.catalog import Catalog, Layer
from jibaro_spark.config import Settings
from jibaro_spark.io import read_stream, read_table, write_table


@pytest.fixture()
def lake(tmp_path):
    return Catalog(Settings(protocol="file", base_path=str(tmp_path)))


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id int, name string, x double",
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_batch_roundtrip(spark, lake, df, fmt):
    ref = lake.ref(Layer.STAGED, "p", "db", f"t_{fmt}")
    opts = {"header": "true"} if fmt == "csv" else {}
    write_table(df, lake, ref, fmt=fmt, mode="overwrite", **opts)
    read_opts = {"header": "true", "inferSchema": "true"} if fmt == "csv" else {}
    back = read_table(spark, lake, ref, fmt=fmt, **read_opts)
    got = sorted((r.id, r.name, r.x) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]


def test_text_roundtrip(spark, lake):
    ref = lake.ref(Layer.RAW, "p", "db", "t_text")
    df = spark.createDataFrame([("line1",), ("line2",)], "value string")
    write_table(df, lake, ref, fmt="text", mode="overwrite")
    back = read_table(spark, lake, ref, fmt="text")
    assert sorted(r.value for r in back.collect()) == ["line1", "line2"]


def test_partitioned_write(spark, lake, df):
    ref = lake.ref(Layer.CURATED, "p", "db", "t_part")
    write_table(df, lake, ref, fmt="parquet", mode="overwrite", partition_by=["name"])
    import os

    assert sorted(
        d for d in os.listdir(lake.path(ref)) if d.startswith("name=")
    ) == ["name=a", "name=b", "name=c"]
    back = read_table(spark, lake, ref, fmt="parquet")
    assert back.count() == 3


def test_stream_read_infers_schema(spark, lake, df):
    ref = lake.ref(Layer.STAGED, "p", "db", "t_stream")
    write_table(df, lake, ref, fmt="parquet", mode="overwrite")
    sdf = read_stream(spark, lake, ref, fmt="parquet")
    assert sdf.isStreaming
    assert set(sdf.columns) == {"id", "name", "x"}
    out = []
    q = (
        sdf.writeStream.outputMode("append")
        .foreachBatch(lambda b, _: out.extend(b.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(out) == 3


def test_observed_write_measures_during_the_write(spark, tmp_path):
    """observed_write returns batch metrics captured by the write job
    itself (Observation API) — no second scan — and the data lands."""
    from pyspark.sql import functions as F

    from jibaro_spark.io import observed_write

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    out = str(tmp_path / "obs_tbl")
    m = observed_write(
        df,
        out,
        metrics={
            "n_rows": F.count(F.lit(1)),
            "v_sum": F.sum("v"),
            "k_max": F.max("k"),
        },
    )
    assert m == {"n_rows": 100, "v_sum": 9900, "k_max": 99}
    assert spark.read.parquet(out).count() == 100
    # default metric
    m2 = observed_write(spark.range(7), str(tmp_path / "obs2"))
    assert m2 == {"n_rows": 7}
