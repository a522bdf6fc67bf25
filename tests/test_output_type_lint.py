"""Output-type portability lint (r6 verdict item #2).

The driver hash-compares Spark results against DuckDB by rendering
values; DECIMAL renders with engine-specific trailing zeros
('123.4500' vs '123.45') and DuckDB widens SUM/COUNT over integers to
HUGEINT — both caused an entire class of red CORRECTNESS rows (8 in
r6, 2 in r5) for queries whose VALUES matched exactly.  The repo
contract (queries/registry.py docstring) is: accumulate in DECIMAL,
publish only engine-neutral types.  This lint turns a once-per-round
driver surprise into a pytest failure:

* every declared query's Spark output schema must contain no
  DecimalType (recursively through struct/array/map), and
* every declared oracle's DuckDB result types must contain no
  DECIMAL or HUGEINT or UBIGINT.

The Spark side inspects the schema only, but BUILDING a query's
DataFrame is not always action-free: queries with bounded driver-side
collects (codebooks, bloom words) or iterative loops pinned by
localCheckpoint (geo NN refinement, chunked prefix sums) execute
those stages at the fixture SF before a schema exists.  Keep such
work fixture-bounded when adding queries, or the lint (and every
other registry-walking test) pays for it.
"""

from __future__ import annotations

import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow

from pyspark.sql import types as T

from jibaro_spark.queries import REGISTRY

ALL_QUERIES = sorted(REGISTRY)
ORACLE_QUERIES = sorted(n for n, dq in REGISTRY.items() if dq.oracle)

_BANNED_DUCK = ("DECIMAL", "HUGEINT", "UBIGINT")


def _decimal_paths(dt: T.DataType, path: str) -> list[str]:
    if isinstance(dt, T.DecimalType):
        return [f"{path}: {dt.simpleString()}"]
    if isinstance(dt, T.StructType):
        return [
            p
            for f in dt.fields
            for p in _decimal_paths(f.dataType, f"{path}.{f.name}")
        ]
    if isinstance(dt, T.ArrayType):
        return _decimal_paths(dt.elementType, f"{path}[]")
    if isinstance(dt, T.MapType):
        return _decimal_paths(dt.keyType, f"{path}<key>") + _decimal_paths(
            dt.valueType, f"{path}<value>"
        )
    return []


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_spark_output_has_no_decimal(name, spark, sf_dir):
    df = REGISTRY[name].fn(spark, sf_dir)
    bad = _decimal_paths(T.StructType(df.schema.fields), name)
    assert not bad, (
        f"{name} publishes DECIMAL at its output boundary ({bad}); "
        "accumulate in decimal but final-cast to DOUBLE/BIGINT "
        "(queries/registry.py contract)"
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_output_has_no_decimal_or_hugeint(name, duck):
    rel = duck.sql(REGISTRY[name].oracle)
    bad = [
        f"{col}: {t}"
        for col, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in _BANNED_DUCK)
    ]
    assert not bad, (
        f"{name} oracle materializes non-portable types ({bad}); wrap in "
        "CAST(... AS DOUBLE) / CAST(... AS BIGINT) at the final select"
    )
