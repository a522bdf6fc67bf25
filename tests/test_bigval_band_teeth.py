"""Teeth test for the bigval memory band (VERDICT r11 #7): the
GC-retry that clears allocation-churn false positives must NOT clear
a kernel whose LIVE set grows with value size.

Two kernels over the same cached ~2 MB payload, measured by the exact
``PeakMemSampler`` + band formula the sweep uses (the payload is
localCheckpoint-ed so value GENERATION stays out of both
measurements):

* linear: hash each value — transient per-row work only → stays
  inside ``mem_limit`` (after the sweep's GC-retry protocol at most);
* amplifier: an Arrow ``mapInPandas`` kernel that holds 800 copies of
  every value LIVE while it computes (the hold-the-whole-document
  shape the band exists to catch; the sampler's descendant-RSS term
  is exactly the surface that sees Arrow workers) — ~1.6 GB live
  against a ~1.28 GB limit → exceeds ``mem_limit`` on the first
  measure AND on the GC-retry re-measure, proving the retry protocol
  cannot mask live-set growth as churn.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts.bigval_band import PeakMemSampler, mem_limit  # noqa: E402

import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow

N_ROWS = 8
VAL_KB = 256
# live copies per value: 8 x 256KB x 2400 = ~4.8 GB >> limit.  The
# margin is deliberately large (not 800/~1.6 GB): inside the FULL
# suite the reused Python workers carry freed-but-still-mapped pages
# from earlier tests, so the allocator satisfies part of the live set
# without growing RSS and the measured delta undershoots the true
# live set (measured: 938 MB delta for a 1.6 GB live set, under the
# ~1.28 GB limit — a false pass of the teeth test, not of the band).
# 4.8 GB exceeds the limit even against any freed pool earlier tests
# could plausibly have left (their peaks are a few hundred MB).
REP = 2400


def _measure(spark, df, floor=None):
    # collect(), not count(): count() lets Catalyst PRUNE unused
    # expressions (an unconsumed amplifier would measure nothing).
    # Retries pass the first measurement's floor back in (the sweep's
    # protocol): reused Python workers keep freed pages in RSS, so a
    # fresh floor after an amplifying run is already elevated and the
    # retry delta would mask live growth as churn.
    with PeakMemSampler(spark.sparkContext._jvm, floor=floor) as ms:
        df.collect()
    return ms.peak_delta, ms.floor


def test_band_teeth(spark):
    from pyspark.sql import functions as F

    rep = REP

    # defined as a closure (not module level): Arrow workers don't
    # have the tests dir on their path, and cloudpickle serializes a
    # closure by value instead of by module reference
    def _amp_fn(it):
        import time as _t

        import pandas as pd

        for pdf in it:
            hold = [v * rep for v in pdf["v"]]  # live: rep x value per row
            _t.sleep(1.0)  # hold while the 50 ms sampler looks
            yield pd.DataFrame({"n": [sum(len(h) for h in hold)]})

    payload_bytes = N_ROWS * VAL_KB << 10
    base = (
        spark.range(N_ROWS)
        .select(
            "id",
            F.concat_ws(
                "",
                F.array_repeat(
                    F.sha2(F.col("id").cast("string"), 256), (VAL_KB << 10) // 64
                ),
            ).alias("v"),
        )
        .repartition(4)
        .localCheckpoint(eager=True)
    )
    linear = base.select(F.xxhash64("v").alias("h"))
    amplifier = base.mapInPandas(_amp_fn, "n long")

    base_peak, _ = _measure(spark, linear)
    limit = mem_limit(base_peak, payload_bytes)

    lin_peak, lin_floor = _measure(spark, linear)
    if lin_peak > limit:  # the sweep's GC-retry protocol
        spark.sparkContext._jvm.java.lang.System.gc()
        lin_retry, _ = _measure(spark, linear, floor=lin_floor)
        lin_peak = min(lin_peak, lin_retry)
    assert lin_peak <= limit, (
        f"linear kernel out of band: {lin_peak/2**20:.0f}MB "
        f"> {limit/2**20:.0f}MB"
    )

    amp_peak, amp_floor = _measure(spark, amplifier)
    assert amp_peak > limit, (
        f"amplifier NOT flagged on first measure: {amp_peak/2**20:.0f}MB "
        f"<= {limit/2**20:.0f}MB — the band has no teeth"
    )
    # the GC-retry protocol must not clear it: collect + re-measure
    # with the FIRST measurement's floor pinned (the sweep's protocol)
    spark.sparkContext._jvm.java.lang.System.gc()
    amp_retry, _ = _measure(spark, amplifier, floor=amp_floor)
    retry_peak = min(amp_peak, amp_retry)
    assert retry_peak > limit, (
        f"amplifier cleared by GC retry: {retry_peak/2**20:.0f}MB "
        f"<= {limit/2**20:.0f}MB — live-set growth masked as churn"
    )
