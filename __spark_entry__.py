"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are populated from the declared-query
registry in :mod:`jibaro_spark.queries` — one entry per implemented
operator from SURVEY.md §2 (plus the [ext] LLM-pipeline operators).
Queries without an oracle entry (6 of 85) are genuinely
non-SQL-expressible — LSH/IVF-approximate retrieval (knn_lsh, knn_ivf,
minhash/simhash near-dup pairs) and engine-specific sketches
(approx_count_distinct, HLL union rollup); each gets the driver's
rows-only check and is verified in ``tests/test_approx_ops.py`` against
exact ground truth instead.  The xxhash64-based fingerprint/signature
ops additionally ship md5 "verifiable modes" that ARE fully
oracle-checked (q_rolling_fingerprint, q_minhash_signature,
q_simhash_signature).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the composed curation pipeline (replay-dup injection →
    quality filter → exact dedup → deterministic split → per-split/lang
    token accounting) on /root/testdata/sf0.001."""
    from jibaro_spark.queries import REGISTRY

    return REGISTRY["q_curation_pipeline"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jibaro_spark.queries import REGISTRY

    return {name: dq.fn for name, dq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from jibaro_spark.queries import REGISTRY

    return {
        name: dq.oracle for name, dq in REGISTRY.items() if dq.oracle is not None
    }
