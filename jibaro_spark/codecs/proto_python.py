"""Pure-Python protobuf decode/encode for Confluent payloads ([ext] —
makes the reference's protobuf staged hop REAL without the
spark-protobuf jar or protoc: the reference compiles registry .proto
text with ``grpc_tools.protoc`` and calls the JVM ``from_protobuf``
(``protobuf_handler.py:89-121``, ``utils.py:125-167``); neither is
available here, but a ``google.protobuf`` runtime is (see
``jibaro_spark.streaming.windows.enable_tws_runtime``), and protobuf
descriptors can be built PROGRAMMATICALLY — no protoc subprocess at
all, which is an operational win even where protoc exists.

Pipeline shape: the wire-format slicing stays native/JVM-side
(:mod:`jibaro_spark.codecs.confluent`); only the payload parse runs in
an Arrow-batched ``mapInPandas`` — a map-only pass, no shuffle.  The
message class is rebuilt once per task from the serialized
``FileDescriptorProto`` (descriptor handles don't pickle; the proto of
the descriptor does).

Supported Spark types (mirrors the reference's Spark→proto3 map,
``utils.py:57-88``): string, int/short (int32), long (int64), float,
double, boolean, binary (bytes), arrays of these (repeated), and
nested structs (nested messages) to any depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ensure_protobuf_runtime() -> bool:
    """Import-or-enable ``google.protobuf`` in THIS process.  Unlike
    :func:`jibaro_spark.streaming.windows.enable_tws_runtime` (which
    exports ``$PYTHONPATH`` and therefore must run before the JVM
    starts), this mutates ``sys.path`` of the current interpreter — so
    calling it from inside an Arrow mapper self-heals each executor
    Python worker even when the session was built before enablement.
    No-op where the real package is installed."""
    try:
        from google.protobuf import descriptor_pb2  # noqa: F401

        return True
    except Exception:
        pass
    import os
    import sys

    from jibaro_spark.streaming.windows import _PROTOBUF_RUNTIME_PATHS

    import importlib

    for p in _PROTOBUF_RUNTIME_PATHS:
        if not os.path.isdir(os.path.join(p, "google", "protobuf")):
            continue
        if p not in sys.path:
            sys.path.insert(0, p)
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        # Executor workers have the spark-core JAR on sys.path; its
        # bundled google/protobuf/*.proto RESOURCES make
        # ``google.protobuf`` import as an EMPTY namespace package,
        # which the probe import above just cached.  Purge those
        # stale file-less modules so the re-import recombines the
        # namespace with the vendored (regular) package winning — a
        # real installed runtime (has __file__) is never purged.
        for mod in [
            m for m in list(sys.modules)
            if m == "google" or m.startswith("google.")
        ]:
            if getattr(sys.modules[mod], "__file__", None) is None:
                del sys.modules[mod]
        importlib.invalidate_caches()
        try:
            from google.protobuf import descriptor_pb2  # noqa: F401

            return True
        except Exception:
            continue
    return False


def has_protobuf_runtime() -> bool:
    return ensure_protobuf_runtime()


#: Spark type → (proto field type enum name, python coercion)
_SCALARS: dict[type, str] = {
    T.StringType: "TYPE_STRING",
    T.IntegerType: "TYPE_INT32",
    T.ShortType: "TYPE_INT32",
    T.LongType: "TYPE_INT64",
    T.FloatType: "TYPE_FLOAT",
    T.DoubleType: "TYPE_DOUBLE",
    T.BooleanType: "TYPE_BOOL",
    T.BinaryType: "TYPE_BYTES",
}


def struct_to_file_descriptor_bytes(
    schema: T.StructType, message_name: str, package: str = "jibaro"
) -> bytes:
    """Serialized ``FileDescriptorProto`` declaring ``message_name``
    (plus nested messages for struct fields) from a Spark schema —
    the programmatic replacement for .proto text + protoc."""
    ensure_protobuf_runtime()
    from google.protobuf import descriptor_pb2

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = f"{message_name.lower()}.proto"
    fdp.package = package
    fdp.syntax = "proto3"

    def fill(msg_proto, struct: T.StructType, prefix: str) -> None:
        for i, field in enumerate(struct.fields, start=1):
            f = msg_proto.field.add()
            f.name = field.name
            f.number = i
            dt = field.dataType
            if isinstance(dt, T.ArrayType):
                f.label = descriptor_pb2.FieldDescriptorProto.LABEL_REPEATED
                dt = dt.elementType
            else:
                f.label = descriptor_pb2.FieldDescriptorProto.LABEL_OPTIONAL
            if isinstance(dt, T.StructType):
                nested_name = f"{prefix}{field.name.capitalize()}Msg"
                f.type = descriptor_pb2.FieldDescriptorProto.TYPE_MESSAGE
                f.type_name = f".{package}.{nested_name}"
                nested = fdp.message_type.add()
                nested.name = nested_name
                fill(nested, dt, nested_name)
            else:
                enum_name = _SCALARS.get(type(dt))
                if enum_name is None:
                    raise TypeError(
                        f"proto_python: unsupported Spark type {dt} "
                        f"for field {field.name!r}"
                    )
                f.type = getattr(descriptor_pb2.FieldDescriptorProto, enum_name)

    top = fdp.message_type.add()
    top.name = message_name
    fill(top, schema, message_name)
    return fdp.SerializeToString()


def _message_class(fdp_bytes: bytes, full_name: str):
    # runs inside the Arrow mapper on executor workers — self-heal the
    # runtime per-process (sys.path, not $PYTHONPATH) before importing
    ensure_protobuf_runtime()
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.ParseFromString(fdp_bytes)
    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)
    return message_factory.GetMessageClass(pool.FindMessageTypeByName(full_name))


def _msg_to_value(msg, struct: T.StructType):
    """Protobuf message → python dict shaped like the Spark struct.
    proto3 has no scalar presence — absent scalars surface as proto
    defaults (0/""/false), absent sub-MESSAGES as None (HasField is
    defined for messages)."""
    out = {}
    for field in struct.fields:
        dt = field.dataType
        v = getattr(msg, field.name)
        if isinstance(dt, T.ArrayType):
            et = dt.elementType
            if isinstance(et, T.StructType):
                out[field.name] = [_msg_to_value(m, et) for m in v]
            else:
                out[field.name] = [bytes(x) if isinstance(x, (bytes, bytearray)) else x for x in v]
        elif isinstance(dt, T.StructType):
            out[field.name] = (
                _msg_to_value(v, dt) if msg.HasField(field.name) else None
            )
        elif isinstance(dt, T.BinaryType):
            out[field.name] = bytes(v)
        else:
            out[field.name] = v
    return out


def _value_to_msg(msg, value: dict, struct: T.StructType) -> None:
    for field in struct.fields:
        v = value.get(field.name) if isinstance(value, dict) else value[field.name]
        if v is None:
            continue
        dt = field.dataType
        if isinstance(dt, T.ArrayType):
            et = dt.elementType
            if isinstance(et, T.StructType):
                for item in v:
                    _value_to_msg(getattr(msg, field.name).add(), item, et)
            else:
                getattr(msg, field.name).extend(list(v))
        elif isinstance(dt, T.StructType):
            _value_to_msg(getattr(msg, field.name), v, dt)
        else:
            # Arrow→pandas converts an integer child array that holds
            # ANY null to float64 — every row of the batch then carries
            # floats (123 → 123.0) and NaN where the null was.  Undo
            # the artifact: NaN means unset; an integral float going
            # into an integer field is the original int.
            if isinstance(v, float):
                if v != v:  # NaN
                    continue
                if isinstance(
                    dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
                ):
                    if not v.is_integer():
                        raise ValueError(
                            f"non-integral value {v!r} for integer proto "
                            f"field {field.name}"
                        )
                    v = int(v)
            setattr(msg, field.name, v)


def decode_protobuf_python(
    df: DataFrame,
    payload_col: str,
    schema: T.StructType,
    message_name: str = "Envelope",
    out_col: str = "value",
    package: str = "jibaro",
    mode: str = "failfast",
) -> DataFrame:
    """Parse a protobuf-payload binary column into a typed struct
    column via Arrow-batched ``mapInPandas`` (map-only; all other
    columns pass through).  Null payloads yield null structs.

    ``mode``: ``failfast`` (default — a corrupt frame aborts the
    batch) or ``permissive`` — unparseable frames yield a null
    ``out_col`` routable to quarantine (mirrors
    ``decode_avro_python``)."""
    if mode not in ("failfast", "permissive"):
        raise ValueError(f"decode_protobuf_python: unknown mode {mode!r}")
    fdp_bytes = struct_to_file_descriptor_bytes(schema, message_name, package)
    full_name = f"{package}.{message_name}"
    in_fields = df.schema.fields
    out_schema = T.StructType(list(in_fields) + [T.StructField(out_col, schema)])

    def mapper(batches):
        cls = _message_class(fdp_bytes, full_name)

        def parse(b):
            if b is None:
                return None
            m = cls()
            if mode == "permissive":
                try:
                    m.ParseFromString(bytes(b))
                except Exception:
                    return None
                return _msg_to_value(m, schema)
            m.ParseFromString(bytes(b))
            return _msg_to_value(m, schema)

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[payload_col].map(parse)
            yield pdf

    return df.mapInPandas(mapper, out_schema)


def encode_protobuf_python(
    df: DataFrame,
    struct_col: str,
    schema: T.StructType,
    message_name: str = "Envelope",
    out_col: str = "payload",
    package: str = "jibaro",
) -> DataFrame:
    """Serialize a struct column to protobuf payload bytes — the
    reverse path (reference ``kafka.py:86-109`` uses ``to_protobuf``);
    compose with :func:`jibaro_spark.codecs.confluent.wire_encode` for
    the full Confluent frame."""
    fdp_bytes = struct_to_file_descriptor_bytes(schema, message_name, package)
    full_name = f"{package}.{message_name}"
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )

    def mapper(batches):
        cls = _message_class(fdp_bytes, full_name)

        def ser(v):
            if v is None:
                return None
            m = cls()
            _value_to_msg(m, v if isinstance(v, dict) else v.asDict(recursive=True), schema)
            return m.SerializeToString()

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[struct_col].map(ser)
            yield pdf

    return df.mapInPandas(mapper, out_schema)


def decode_confluent_batch_protobuf_python(
    batch: DataFrame,
    schema_resolver,
    message_name: str = "Envelope",
    key_message_name: str = "Key",
    on_tombstone: str = "drop",
    scratch_dir: "str | None" = None,
    spill_threshold: "int | None" = None,
    on_unknown_schema: str = "error",
) -> list:
    """Schema-partitioned Confluent protobuf decode (reference R7 /
    ``protobuf_handler.py:59-133``) on the pure-Python codec: wire
    slicing and the distinct-schema-pair loop are the same
    native-expression machinery as the jar path (shared
    :func:`~jibaro_spark.codecs.confluent.pair_frames` skeleton, incl.
    the staged many-schema route and the unknown-schema policy); each
    pair's frame decodes its key/value payloads with exactly that
    pair's schemas via Arrow ``mapInPandas``.

    ``schema_resolver(role, schema_id) -> StructType`` supplies the
    reader schema per id ("key"/"value" roles) — the id-partitioned
    loop is what makes mixed-schema batches (in-flight schema
    evolution) decode correctly.  Returns ``[(pair, DataFrame)]``.
    """
    from pyspark.sql import functions as F

    from jibaro_spark.codecs.confluent import (
        KAFKA_META_COLS,
        SPILL_THRESHOLD,
        pair_frames,
        resolve_schema_or_policy,
        split_wire_format,
    )

    sliced = split_wire_format(batch, "protobuf")
    out = []
    for key_id, value_id, part in pair_frames(
        sliced,
        on_tombstone,
        scratch_dir,
        SPILL_THRESHOLD if spill_threshold is None else spill_threshold,
    ):
        pair = (key_id, value_id)
        kschema, kq = resolve_schema_or_policy(
            schema_resolver, "key", key_id, pair, on_unknown_schema
        )
        vschema, vq = resolve_schema_or_policy(
            schema_resolver, "value", value_id, pair, on_unknown_schema
        )
        if (key_id is not None and kschema is None) or (
            value_id is not None and vschema is None
        ):
            if kq or vq:  # keep: raw-binary dead-letter frame
                out.append(
                    (
                        pair,
                        part.select(
                            F.col("keyPayload").alias("key"),
                            F.col("valuePayload").alias("value"),
                            *[c for c in KAFKA_META_COLS if c in part.columns],
                            "keySchemaId",
                            "valueSchemaId",
                        ),
                    )
                )
            continue
        # the raw binary key/value columns are superseded by the typed
        # structs about to take their names
        part = part.drop("key", "value")
        if value_id is not None:
            part = decode_protobuf_python(
                part, "valuePayload", vschema,
                message_name, out_col="value",
            )
        else:
            part = part.withColumn("value", F.lit(None))
        if key_id is not None:
            part = decode_protobuf_python(
                part, "keyPayload", kschema,
                key_message_name, out_col="key", package="jibarokey",
            )
        else:
            part = part.withColumn("key", F.lit(None).cast("string"))
        keep = (
            ["key", "value"]
            + [c for c in KAFKA_META_COLS if c in part.columns]
            + ["keySchemaId", "valueSchemaId"]
        )
        out.append(((key_id, value_id), part.select(*keep)))
    return out


def encode_confluent_protobuf_python(
    df: DataFrame,
    key_cols: list,
    registry,
    topic: str,
) -> DataFrame:
    """Reverse path on the Python protobuf codec — the missing half of
    the jar-free publisher (reference ``kafka.py:86-109`` protobuf
    branch; the Avro twin is
    :func:`jibaro_spark.codecs.avro_python.encode_confluent_avro_python`):
    derive proto3 schema text from the DataFrame, register under
    ``{topic}-key``/``{topic}-value`` as ``PROTOBUF`` subjects, encode
    both sides with the Arrow mapper, and assemble Confluent frames
    (magic ++ id ++ message-index ``0x00`` ++ payload).  Output is
    consumable by :func:`decode_confluent_batch_protobuf_python` with
    resolver ``proto_schema_to_struct(registry.get_schema(id))`` —
    closing the jar-free protobuf produce→consume loop end to end.

    Scale shape: map-only (two Arrow passes fused into one stage), no
    shuffle; registry calls happen once on the driver at plan time.
    """
    from pyspark.sql import functions as F

    from jibaro_spark.codecs.confluent import wire_encode
    from jibaro_spark.codecs.schemas import to_proto_schema

    value_cols = [c for c in df.columns if c not in key_cols]
    value_schema_t = df.select(*value_cols).schema
    value_text = to_proto_schema(value_schema_t, "Envelope")
    value_id = registry.register(f"{topic}-value", value_text, "PROTOBUF")

    staged = df.select(
        F.struct(*value_cols).alias("__v"),
        *([F.struct(*key_cols).alias("__k")] if key_cols else []),
    )
    staged = encode_protobuf_python(
        staged, "__v", value_schema_t, "Envelope", out_col="__vp"
    )
    value_bin = wire_encode(F.col("__vp"), value_id, "protobuf")

    if key_cols:
        key_schema_t = df.select(*key_cols).schema
        key_text = to_proto_schema(key_schema_t, "Key")
        key_id = registry.register(f"{topic}-key", key_text, "PROTOBUF")
        staged = encode_protobuf_python(
            staged, "__k", key_schema_t, "Key", out_col="__kp",
            package="jibarokey",
        )
        key_bin = wire_encode(F.col("__kp"), key_id, "protobuf")
    else:
        key_bin = F.lit(None).cast("binary")
    return staged.select(key_bin.alias("key"), value_bin.alias("value"))
