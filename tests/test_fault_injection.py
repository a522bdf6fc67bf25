"""Pytest guards for the txlog crash/fault-injection class (seventh
fuzz class, VERDICT r11 #1).

The scenarios live in ``scripts/fault_inject.py`` (import-safe, no
SparkSession at import — the ADVICE r11 #3 discipline); this file runs
every in-process scenario through the shared session so a regression
in the transactional plane's crash contracts fails CI, not just the
per-round script sweep.  The SIGKILL-subprocess scenario (F2) is
script-only: it is the full-fidelity twin of the in-process F1 kill
point (identical filesystem state — txlog runs no cleanup between the
data-file moves and the commit link) and costs a 15 s Spark boot.
"""

from __future__ import annotations

import os
import sys

import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from scripts import fault_inject as FI  # noqa: E402


@pytest.mark.parametrize(
    "scenario", FI.IN_PROCESS_SCENARIOS, ids=lambda f: f.__name__
)
def test_fault_scenario(spark, tmp_path, scenario):
    results = FI.run(spark, scenarios=[scenario], root=str(tmp_path))
    failed = [(n, d) for n, ok, d in results if not ok]
    assert not failed, failed
    assert len(results) >= 3  # each scenario asserts several contracts
