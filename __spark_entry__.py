"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are populated from the declared-query
registry in :mod:`jibaro_spark.queries` — one entry per implemented
operator from SURVEY.md §2 (plus the [ext] LLM-pipeline operators).
Queries without an oracle entry (11 of 356) are genuinely
non-SQL-expressible — LSH/IVF/IVF-PQ approximate retrieval (knn_lsh,
knn_ivf, knn_ivfpq, minhash/simhash near-dup pairs), engine-specific
sketches (approx_count_distinct, HLL union rollup, count-min heavy
hitters, approx_percentile quantiles), and the iterative BPE trainer; each gets the driver's
rows-only check and is verified against exact ground truth in pytest
(``tests/test_approx_ops.py``, ``tests/test_units.py``) instead.  The xxhash64-based fingerprint/signature
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


def _driver_confirmed() -> "dict[str, int]":
    """Query name -> LATEST round number with a green row in a driver
    CORRECTNESS_r*.json (hash-matched, or the rows-only check for
    no-oracle queries).  Membership rotates never-yet-confirmed queries
    to the front of ``queries()`` so a prefix-capped correctness run
    converges to a driver-confirmed row for every registered query
    (VERDICT r3 §Next-1); the round number additionally orders the
    confirmed lane least-recently-confirmed first, so once the ledger
    is closed the capped prefix re-verifies the STALEST confirmations
    instead of the same registry prefix forever (VERDICT r9 #2)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    confirmed: "dict[str, int]" = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            if r.get("hash_match") is True or (
                r.get("err") == "no_oracle" and r.get("spark_rows") is not None
            ):
                confirmed[name] = max(confirmed.get(name, 0), rnd)
    return confirmed


def _interleaved() -> "dict[str, object]":
    """Registry entries round-robined across their defining modules,
    never-driver-confirmed queries first.

    Rationale: a bounded/prefix-limited consumer of ``queries()`` (a
    correctness run with a count or time budget) should still see every
    operator FAMILY — TPC-H relational, event windows, LLM/text ops,
    pipeline composition, multimodal, scale primitives — rather than
    exhausting its budget inside one module.  Within that, queries that
    have never received a green row in a prior round's
    CORRECTNESS_r*.json sort ahead of already-confirmed ones, so the
    union of capped driver runs converges to all registered queries
    (every query is green in the pytest DuckDB harness either way;
    this only rotates which subset the driver re-verifies).  Coverage
    is unchanged when the full dict is consumed.
    """
    from collections import OrderedDict, defaultdict

    from jibaro_spark.queries import REGISTRY

    confirmed = _driver_confirmed()

    def round_robin(items: "list[tuple[str, object]]", out: "OrderedDict[str, object]") -> None:
        by_mod: "defaultdict[str, list]" = defaultdict(list)
        for name, dq in items:
            by_mod[dq.fn.__module__].append((name, dq))
        lanes = [by_mod[m] for m in by_mod]
        i = 0
        while lanes and i <= max(len(lane) for lane in lanes):
            for lane in lanes:
                if i < len(lane):
                    name, dq = lane[i]
                    out[name] = dq
            i += 1

    out: "OrderedDict[str, object]" = OrderedDict()
    pending = [(n, d) for n, d in REGISTRY.items() if n not in confirmed]
    done = [(n, d) for n, d in REGISTRY.items() if n in confirmed]
    # Queries from modules that already have SOME driver-confirmed
    # entries have been waiting since an earlier round — they outrank
    # queries of brand-new (all-pending) modules, so additions made
    # this round never displace older pending work from the capped
    # prefix.
    confirmed_mods = {d.fn.__module__ for n, d in done}
    pend_old = [(n, d) for n, d in pending if d.fn.__module__ in confirmed_mods]
    pend_new = [(n, d) for n, d in pending if d.fn.__module__ not in confirmed_mods]
    round_robin(pend_old, out)  # never-driver-confirmed first, all modules
    round_robin(pend_new, out)
    # Confirmed lane: least-recently-confirmed vintage first (VERDICT
    # r9 #2), so edits made after a query's last driver confirmation
    # are re-verified within ~ceil(354/50) rounds; round-robin across
    # modules WITHIN a vintage keeps family diversity in the prefix.
    by_round: "defaultdict[int, list]" = defaultdict(list)
    for n, d in done:
        by_round[confirmed[n]].append((n, d))
    for rnd in sorted(by_round):
        round_robin(by_round[rnd], out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: dq.fn for name, dq in _interleaved().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: dq.oracle
        for name, dq in _interleaved().items()
        if dq.oracle is not None
    }
