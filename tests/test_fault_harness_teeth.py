"""Teeth tests for the fault-injection harness (the band-teeth
discipline applied to the r12 fault class): a harness that passes on
a BROKEN transactional plane proves nothing.  Each test disables one
claimed protection and asserts the corresponding scenario actually
reports failures.
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


def _failed(results):
    return [n for n, ok, _ in results if not ok]


def test_replay_scenario_catches_disabled_watermark(spark, tmp_path, monkeypatch):
    """With the txn-watermark lookup lobotomized (idempotence off), a
    replayed micro-batch COMMITS — F3 must flag it."""
    from jibaro_spark import txlog

    monkeypatch.setattr(txlog, "latest_txn_version", lambda table, app: None)
    failed = _failed(
        FI.scenario_duplicate_batch_replay(spark, str(tmp_path))
    )
    assert any("replay" in n or "rows_unchanged" in n or "head" in n for n in failed), (
        f"F3 passed with idempotence disabled: failed={failed}"
    )


def test_vacuum_scenario_catches_missing_age_guard(spark, tmp_path, monkeypatch):
    """With the age guard forced open (every file 'old enough'), a
    concurrent vacuum eats the in-flight writer's files — F11 must
    flag it."""
    from jibaro_spark import txlog

    real = txlog.vacuum_versioned

    def reckless(table, keep_versions=5, min_file_age_s=3600.0):
        return real(table, keep_versions, 0.0)  # guard bypassed

    monkeypatch.setattr(txlog, "vacuum_versioned", reckless)
    failed = _failed(FI.scenario_vacuum_age_guard(spark, str(tmp_path)))
    assert "f11_age_guard_protects" in failed, (
        f"F11 passed with the age guard bypassed: failed={failed}"
    )


def test_pinned_reader_scenario_catches_greedy_vacuum(spark, tmp_path, monkeypatch):
    """With retention collapsed to head-only regardless of the caller's
    keep_versions, vacuum deletes a pinned in-window snapshot's files —
    F7 must flag it."""
    from jibaro_spark import txlog

    real = txlog.vacuum_versioned

    def greedy(table, keep_versions=5, min_file_age_s=3600.0):
        return real(table, 1, min_file_age_s)  # retention ignored

    monkeypatch.setattr(txlog, "vacuum_versioned", greedy)
    # run() converts a scenario crash into a *_crashed failure entry —
    # the pinned re-read itself explodes once its files are deleted,
    # which is as much a flag as an assertion failure
    failed = _failed(
        FI.run(
            spark,
            scenarios=[FI.scenario_vacuum_vs_pinned_reader],
            root=str(tmp_path),
        )
    )
    assert any(
        n.startswith("f7_pinned") or n.endswith("_crashed") for n in failed
    ), f"F7 passed with retention ignored: failed={failed}"
