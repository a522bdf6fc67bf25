"""CI guards for the schema-SHAPE degeneracy class (eighth class,
VERDICT r11 #2) — scaled-down twins of ``scripts/schema_shape_probe.py``
(which runs the full 10k-distinct-schema-id sweep per round):

* many-schema decode takes the staged partition-pruned route (each
  pair's frame reads ONLY its own partition directory — the
  no-job-storm property), covers the batch exactly, decodes right;
* staged route is bit-identical to the direct route on a mixed batch
  (null keys, tombstones, drop AND keep modes);
* 500-column rows survive codec decode, CDC apply, txlog roundtrip;
* 24-level nesting + arrays-of-structs survive the U2 schema
  derivations, from_json, and the pure-Python Avro codec.
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

from scripts import schema_shape_probe as SP  # noqa: E402


def _assert_green(results):
    failed = [(n, d) for n, ok, d in results if not ok]
    assert not failed, failed


def test_many_schema_ids_staged(spark, tmp_path):
    _assert_green(
        SP.scenario_many_schema_ids(spark, str(tmp_path), n_ids=60)
    )


def test_direct_vs_staged_identity(spark, tmp_path):
    _assert_green(
        SP.scenario_direct_vs_staged_identity(spark, str(tmp_path))
    )


def test_wide_rows(spark, tmp_path):
    _assert_green(SP.scenario_wide_rows(spark, str(tmp_path)))


def test_deep_nesting(spark, tmp_path):
    _assert_green(SP.scenario_deep_nesting(spark, str(tmp_path)))


def test_direct_route_untouched_below_threshold(spark, tmp_path):
    """A few-schema batch with a scratch dir must NOT pay the staged
    write (the common case keeps its zero-extra-I/O plan)."""
    import json

    from jibaro_spark.codecs.confluent import (
        InMemorySchemaRegistry,
        decode_confluent_batch_pairs,
    )

    reg = InMemorySchemaRegistry()
    sid = reg.register("few-value", "id int")
    batch = SP._kafka_rows(
        spark,
        [(None, SP._frame(sid, json.dumps({"id": i}).encode())) for i in range(5)],
    )
    scratch = str(tmp_path / "scratch")
    out = decode_confluent_batch_pairs(batch, reg, "json", scratch_dir=scratch)
    assert len(out) == 1
    assert out[0][1].count() == 5
    assert not os.path.exists(scratch)  # direct route: scratch untouched
