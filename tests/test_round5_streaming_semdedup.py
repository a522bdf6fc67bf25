"""Streaming semantic dedup (applyInPandasWithState): replicas are
flagged ACROSS micro-batches — the property per-batch dedup cannot
provide — and the stream result equals the batch-greedy reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jibaro_spark.streaming.windows import streaming_semantic_dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cents(spark):
    from jibaro_spark.operators.similarity import seed_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    return seed_centroids(emb, "vec_id", "embedding", 4)


def _originals(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).filter(F.col("vec_id") < 100)


def _replicas(spark):
    return _originals(spark).filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 7000).alias("vec_id"), "embedding"
    )


def test_batch_mode_flags_replicas(spark, cents):
    corpus = _originals(spark).unionByName(_replicas(spark))
    out = streaming_semantic_dedup(
        corpus, "vec_id", "embedding", cents, threshold=0.999999
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == corpus.count()
    for r in rows.values():
        if r["vec_id"] >= 7000:
            assert r["is_dup"] and r["dup_of"] == r["vec_id"] - 7000, r
        else:
            assert not r["is_dup"] and r["dup_of"] is None, r


def test_cross_microbatch_state(spark, cents, tmp_path):
    """Originals arrive in micro-batch 1, replicas in micro-batch 2 —
    the replicas must still be flagged as duplicates OF the batch-1
    originals (state carried across batches)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    _originals(spark).coalesce(1).write.parquet(f"{src}/b1")

    schema = "vec_id long, embedding array<float>"

    def run_once():
        sdf = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = (
            streaming_semantic_dedup(
                sdf, "vec_id", "embedding", cents, threshold=0.999999
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)  # SAME checkpoint: state resumes
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    # second micro-batch (separate query run, recovered state): replicas
    _replicas(spark).coalesce(1).write.parquet(f"{src}/b2")
    run_once()
    all_rows = {r["vec_id"]: r for r in spark.read.parquet(sink).collect()}
    originals = {r["vec_id"] for r in _originals(spark).collect()}
    replicas = {r["vec_id"] for r in _replicas(spark).collect()}
    assert originals <= set(all_rows)
    assert replicas <= set(all_rows)
    for v in replicas:
        r = all_rows[v]
        assert r["is_dup"], f"replica {v} not flagged across micro-batches"
        assert r["dup_of"] == v - 7000
    for v in originals:
        assert not all_rows[v]["is_dup"]


def test_state_cap_bounds_memory(spark, cents):
    corpus = _originals(spark)
    out = streaming_semantic_dedup(
        corpus, "vec_id", "embedding", cents, threshold=2.0,  # nothing dups
        max_state_per_cell=5,
    )
    # runs to completion and emits one row per input — the cap only
    # bounds state, never drops output rows
    assert out.count() == corpus.count()


def test_null_ids_and_vectors_are_dropped(spark):
    """NULL id/vector rows are not deduplicable: they must be filtered
    before the kernel (NULL grouping cell, int()/asarray crashes)."""
    from jibaro_spark.streaming.windows import streaming_semantic_dedup

    cents = [[1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (None, [1.0, 0.0]),
            (3, None),
            (4, [0.99, 0.01]),
        ],
        "id long, vec array<double>",
    )
    out = streaming_semantic_dedup(df, "id", "vec", cents, threshold=0.95).collect()
    ids = {r["id"] for r in out}
    assert ids == {1, 4}
    dup = {r["id"]: r["is_dup"] for r in out}
    assert dup[1] is False and dup[4] is True
