"""Probabilistic record linkage (Fellegi–Sunter) as a blocked
filter-score join.

Entity resolution between two record sets: candidates come from a
blocking equi-join (never a cross product — the same candidate
discipline as :func:`jibaro_spark.operators.dedup.edit_distance_join`),
each candidate pair is scored by summing per-field log-odds agreement
weights, and the score is thresholded into the classic
match / possible / non-match decision bands (Fellegi & Sunter, JASA
1969).

Determinism contract: the m/u probabilities are turned into weights
ONCE driver-side (``log2``, rounded to 6 decimals) and enter the plan
as exact ``decimal(18,6)`` literals, so the pair score is a sum of
identical decimals in any engine — hash-stable cross-engine, no float
accumulation order sensitivity.

Scale notes (100 TB): the shuffle is the blocking join; its fan-out is
the block size, which the caller controls by key choice (nation,
domain, zip, name-prefix, simhash band, …).  Scoring is map-side
codegen over the surviving candidates.  No collect, no window, no
cross product (``ValueError`` without blocking keys).

Reference scope: the reference engine has no linkage surface
(`/root/reference/jibaro/` is a lakehouse path/codec wrapper); this is
an [ext] entity-resolution operator from the LLM-pipeline brief.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jibaro_spark.operators.util import ensure_parallelism


@dataclass(frozen=True)
class FieldComparator:
    """One field comparison: an agreement predicate over the joined
    candidate frame plus the Fellegi–Sunter m/u probabilities
    (``m`` = P(fields agree | same entity), ``u`` = P(fields agree |
    different entities))."""

    label: str
    agree: Column
    m: float
    u: float

    @property
    def agree_weight(self) -> float:
        return round(math.log2(self.m / self.u), 6)

    @property
    def disagree_weight(self) -> float:
        return round(math.log2((1.0 - self.m) / (1.0 - self.u)), 6)


def fellegi_sunter_join(
    a: DataFrame,
    b: DataFrame,
    a_id: str,
    b_id: str,
    block_on: "list[tuple[str, str]]",
    comparators: "list[FieldComparator]",
    upper: float,
    lower: float,
) -> DataFrame:
    """Blocked Fellegi–Sunter linkage join.

    ``a`` and ``b`` must have DISJOINT column names (pre-alias before
    calling — same contract as the dedup joins); ``block_on`` pairs
    ``(a_col, b_col)`` define the candidate equi-join and are required.

    Returns one row per candidate pair: ``(a_id, b_id,
    score decimal(28,6), decision)`` with decision ``match`` when
    ``score >= upper``, ``non_match`` when ``score <= lower``, else
    ``possible``.
    """
    if not block_on:
        raise ValueError(
            "fellegi_sunter_join: blocking keys are required — an "
            "unblocked linkage join is a cross product at scale"
        )
    if not comparators:
        raise ValueError("fellegi_sunter_join: need at least one comparator")
    overlap = set(a.columns) & set(b.columns)
    if overlap:
        raise ValueError(
            f"fellegi_sunter_join: sides share column names {sorted(overlap)}; "
            "alias them apart so field references are unambiguous"
        )
    cond = None
    for la, rb in block_on:
        eq = F.col(la) == F.col(rb)
        cond = eq if cond is None else (cond & eq)
    # Spread the probe side before the blocking join (guide §2.5 input
    # skew): per-pair scoring is map-side codegen over the join's
    # fan-out, so it inherits the probe side's partitioning — a
    # single-file scan would put the whole O(n·block) scoring stage on
    # one core.  Hash on the id (unique) keeps the exchange
    # deterministic; no-op whenever the input is already parallel.
    joined = ensure_parallelism(a, by=a_id).join(b, cond)

    score = None
    for c in comparators:
        term = (
            F.when(c.agree, F.lit(str(c.agree_weight)))
            .otherwise(F.lit(str(c.disagree_weight)))
            .cast("decimal(18,6)")
        )
        score = term if score is None else (score + term)
    score = score.cast("decimal(28,6)")

    up = F.lit(str(round(upper, 6))).cast("decimal(28,6)")
    lo = F.lit(str(round(lower, 6))).cast("decimal(28,6)")
    return joined.select(
        F.col(a_id),
        F.col(b_id),
        score.alias("score"),
        F.when(score >= up, F.lit("match"))
        .when(score <= lo, F.lit("non_match"))
        .otherwise(F.lit("possible"))
        .alias("decision"),
    )
