"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-partitioned.

    Compute-heavy operators (minhash/simhash signatures, cosine
    verification) are bottlenecked by per-row expression cost, not I/O;
    a small parquet file arrives as 1 partition and would serialize the
    whole job onto one core.  At real scale the input already has ≥
    ``defaultParallelism`` partitions and this is a no-op — so the full
    round-robin shuffle only ever happens on small inputs where it is
    cheap.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
