"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame,
    min_partitions: int | None = None,
    by: "str | list[str] | None" = None,
) -> DataFrame:
    """Repartition ONLY when the input is under-partitioned.

    Compute-heavy operators (minhash/simhash signatures, cosine
    verification) are bottlenecked by per-row expression cost, not I/O;
    a small parquet file arrives as 1 partition and would serialize the
    whole job onto one core.  At real scale the input already has ≥
    ``defaultParallelism`` partitions and this is a no-op — so the full
    shuffle only ever happens on small inputs where it is cheap.

    ``by``: optional column to hash-partition on instead of the default
    round-robin.  Round-robin is non-deterministic, which blocks BOTH
    cache-plan matching and ReusedExchange — operators that scan their
    input more than once (e.g. ``exact_quantiles_bucketed``) need a
    deterministic exchange or every pass repeats the scan+shuffle.

    ``JIBARO_SPARK_ENSURE_PARALLELISM=0`` disables the spread globally
    (measurement/debug gate for within-session A/B comparisons).
    """
    import os

    if os.environ.get("JIBARO_SPARK_ENSURE_PARALLELISM", "1") == "0":
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        from pyspark.sql import functions as F

        if by is not None:
            cols = [by] if isinstance(by, str) else list(by)
            return df.repartition(target, *[F.col(c) for c in cols])
        return df.repartition(target)
    return df
