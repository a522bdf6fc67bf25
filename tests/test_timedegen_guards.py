"""Guards for the extreme-timestamp (timedegen, ninth) class.

Pins the CLIENT materialization limit the class's fixture routes
around, and re-runs a representative family of event queries on the
mutated fixture so a truncation/floor-division regression fails CI,
not just the per-round sweep.
"""

from __future__ import annotations

import datetime
import os
import subprocess
import sys

import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def test_year1_day1_is_uncollectable_client_limit(spark):
    """0001-01-01T00:00 cannot round-trip pyspark's driver-side
    conversion (the Julian<->proleptic rebase underflows into year 0
    — datetime cannot represent it), while 0001-01-08 survives with
    its value intact.  This is why the timedegen fixture's era-edge
    row sits on day 8: any week-truncation of days 1-7 lands back on
    the un-materializable day 1.  If a pyspark upgrade ever fixes
    the conversion, this test will flag it and the fixture can move
    to the true edge."""
    df1 = spark.createDataFrame(
        [(datetime.datetime(1, 1, 1, 0, 0, 0),)], "ts timestamp"
    )
    with pytest.raises(Exception, match="year 0"):
        df1.collect()
    # engine-side the value is fine — only client materialization fails
    assert df1.selectExpr("cast(ts as string)").collect()[0][0] == (
        "0001-01-01 00:00:00"
    )
    df8 = spark.createDataFrame(
        [(datetime.datetime(1, 1, 8, 0, 0, 0),)], "ts timestamp"
    )
    assert df8.collect()[0][0] == datetime.datetime(1, 1, 8, 0, 0)


FAMILY = [
    "q_cohort_retention",       # week truncation + datediff//7
    "q_sessionize_events",      # lag + epoch-seconds gaps
    "q_event_funnel",           # ordered sequences across eras
    "q_latest_event_per_user",  # max over a 10k-year domain
    "q_fill_forward",           # carry under extreme order keys
]


def test_timedegen_family(tmp_path):
    """Representative per-family re-drive of the timedegen sweep in
    ONE subprocess (the harness builds its own session + fixture)."""
    env = dict(
        os.environ,
        NULLFUZZ_CLASS="timedegen",
        NULLFUZZ_DIR=str(tmp_path / "fixture"),
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "null_fuzz_contract.py"),
            *FAMILY,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    for name in FAMILY:
        assert (
            f"{name}: OK" in proc.stdout
            or f"{name}: rows-only" in proc.stdout
        ), f"{name} missing from sweep output:\n{proc.stdout[-2000:]}"
