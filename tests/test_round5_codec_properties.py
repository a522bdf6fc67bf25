"""Property-based evidence for the hand-written binary codecs: Avro
round-trip identity over randomized values (direct _read/_write — no
Spark in the loop, so hypothesis can run hundreds of cases), protobuf
round-trip via the generated message classes, and genuinely concurrent
txlog writers."""

from __future__ import annotations

import threading

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from jibaro_spark.codecs import avro_python as A

AVRO_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), nullable=False),
        T.StructField("l", T.LongType(), nullable=True),
        T.StructField("s", T.StringType(), nullable=True),
        T.StructField("b", T.BooleanType(), nullable=False),
        T.StructField("d", T.DoubleType(), nullable=False),
        T.StructField("raw", T.BinaryType(), nullable=True),
        T.StructField("xs", T.ArrayType(T.LongType(), True), nullable=False),
        T.StructField(
            "nested",
            T.StructType(
                [
                    T.StructField("k", T.StringType(), nullable=False),
                    T.StructField("v", T.DoubleType(), nullable=True),
                ]
            ),
            nullable=True,
        ),
    ]
)

_value_strategy = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "l": st.one_of(
            st.none(), st.integers(min_value=-(2**63), max_value=2**63 - 1)
        ),
        "s": st.one_of(st.none(), st.text(max_size=40)),
        "b": st.booleans(),
        "d": st.floats(allow_nan=False, width=64),
        "raw": st.one_of(st.none(), st.binary(max_size=32)),
        "xs": st.lists(
            st.one_of(st.none(), st.integers(min_value=-(2**40), max_value=2**40)),
            max_size=8,
        ),
        "nested": st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {
                    "k": st.text(max_size=10),
                    "v": st.one_of(
                        st.none(), st.floats(allow_nan=False, width=64)
                    ),
                }
            ),
        ),
    }
)


@given(_value_strategy)
@settings(max_examples=300, deadline=None)
def test_avro_roundtrip_property(value):
    out = bytearray()
    A._write(out, value, AVRO_SCHEMA, nullable=False)
    back = A._read(A._Reader(bytes(out)), AVRO_SCHEMA, nullable=False)
    assert back == value


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=300, deadline=None)
def test_avro_zigzag_long_property(n):
    out = bytearray()
    A._write(out, n, T.LongType(), nullable=False)
    assert A._read(A._Reader(bytes(out)), T.LongType(), nullable=False) == n


def test_proto_roundtrip_property():
    from jibaro_spark.codecs import proto_python as P

    if not P.has_protobuf_runtime():
        pytest.skip("no google.protobuf runtime")
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("xs", T.ArrayType(T.DoubleType())),
            T.StructField(
                "n",
                T.StructType([T.StructField("k", T.StringType())]),
            ),
        ]
    )
    fdp = P.struct_to_file_descriptor_bytes(schema, "PropMsg")
    cls = P._message_class(fdp, "jibaro.PropMsg")

    @given(
        st.fixed_dictionaries(
            {
                "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "s": st.text(max_size=30),
                "xs": st.lists(st.floats(allow_nan=False, width=64), max_size=6),
                "n": st.one_of(
                    st.none(),
                    st.fixed_dictionaries({"k": st.text(max_size=8)}),
                ),
            }
        )
    )
    @settings(max_examples=200, deadline=None)
    def check(value):
        m = cls()
        P._value_to_msg(m, value, schema)
        m2 = cls()
        m2.ParseFromString(m.SerializeToString())
        back = P._msg_to_value(m2, schema)
        assert back["a"] == value["a"]
        assert back["s"] == value["s"]
        assert back["xs"] == value["xs"]
        if value["n"] is None:
            assert back["n"] is None
        else:
            assert back["n"] == value["n"]

    check()


def test_txlog_concurrent_appenders_lose_nothing(spark, tmp_path):
    """8 racing appenders on one table: optimistic-commit retry must
    serialize them into 8 distinct versions with every row present."""
    from pyspark.sql import functions as F

    from jibaro_spark import txlog as TX

    table = str(tmp_path / "race")
    TX.write_versioned(
        spark.range(0, 1).select(F.col("id").alias("v")), table
    )
    errors: list[Exception] = []

    def worker(i: int) -> None:
        try:
            TX.write_versioned(
                spark.range(100 * i, 100 * i + 3).select(F.col("id").alias("v")),
                table,
                max_retries=50,
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 9)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert TX.latest_version(table) == 8
    vals = sorted(r["v"] for r in TX.read_versioned(spark, table).collect())
    expected = [0] + [100 * i + j for i in range(1, 9) for j in range(3)]
    assert vals == sorted(expected)


def test_schema_diff_and_backward_compat():
    from pyspark.sql import types as TT

    from jibaro_spark.codecs.schemas import is_backward_compatible, schema_diff

    old = TT.StructType(
        [
            TT.StructField("id", TT.LongType(), nullable=False),
            TT.StructField("name", TT.StringType()),
            TT.StructField(
                "meta",
                TT.StructType([TT.StructField("src", TT.StringType())]),
            ),
        ]
    )
    # compatible: add nullable field (top + nested), relax nullability
    new_ok = TT.StructType(
        [
            TT.StructField("id", TT.LongType(), nullable=True),
            TT.StructField("name", TT.StringType()),
            TT.StructField(
                "meta",
                TT.StructType(
                    [
                        TT.StructField("src", TT.StringType()),
                        TT.StructField("lang", TT.StringType()),
                    ]
                ),
            ),
        ]
    )
    d = schema_diff(old, new_ok)
    assert d["added"] == ["meta.lang"]
    assert d["relaxed_nullability"] == ["id"]
    assert not d["removed"] and not d["retyped"]
    assert is_backward_compatible(old, new_ok)

    # incompatible: retype, remove, add non-nullable
    new_retype = TT.StructType(
        [
            TT.StructField("id", TT.StringType(), nullable=False),
            TT.StructField("name", TT.StringType()),
            TT.StructField(
                "meta",
                TT.StructType([TT.StructField("src", TT.StringType())]),
            ),
        ]
    )
    assert "id: bigint -> string" in schema_diff(old, new_retype)["retyped"]
    assert not is_backward_compatible(old, new_retype)

    new_removed = TT.StructType(old.fields[:2])
    assert schema_diff(old, new_removed)["removed"] == ["meta"]
    assert not is_backward_compatible(old, new_removed)

    new_required = TT.StructType(
        list(old.fields) + [TT.StructField("req", TT.LongType(), nullable=False)]
    )
    assert not is_backward_compatible(old, new_required)
