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


def _interleaved() -> "dict[str, object]":
    """Registry entries round-robined across their defining modules.

    Rationale: a bounded/prefix-limited consumer of ``queries()`` (a
    correctness run with a count or time budget) should still see every
    operator FAMILY — TPC-H relational, event windows, LLM/text ops,
    pipeline composition, multimodal, scale primitives — rather than
    exhausting its budget inside one module.  Round-robin by module
    keeps any prefix representative; coverage is unchanged when the
    full dict is consumed.
    """
    from collections import OrderedDict, defaultdict

    from jibaro_spark.queries import REGISTRY

    by_mod: "defaultdict[str, list]" = defaultdict(list)
    for name, dq in REGISTRY.items():
        by_mod[dq.fn.__module__].append((name, dq))
    lanes = [by_mod[m] for m in by_mod]
    out: "OrderedDict[str, object]" = OrderedDict()
    i = 0
    while any(lanes):
        for lane in lanes:
            if i < len(lane):
                name, dq = lane[i]
                out[name] = dq
        i += 1
        if i > max(len(lane) for lane in lanes):
            break
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: dq.fn for name, dq in _interleaved().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: dq.oracle
        for name, dq in _interleaved().items()
        if dq.oracle is not None
    }
