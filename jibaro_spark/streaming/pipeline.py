"""Layer-to-layer pipeline hops (reference ``jibaro/datalake/cdc.py``).

Each hop is Structured Streaming with a bounded incremental trigger
(``availableNow`` — stream-as-batch, reference ``cdc.py:41-45``), the
per-table checkpoint convention (``streaming.py:60-62``), and
``foreachBatch`` for the decode/merge loops (``avro_handler.py:117-137``,
``cdc.py:249-256``).

Source flexibility: ``kafka_to_raw`` uses the Kafka connector when its
jar is on the classpath; ``source_to_raw`` accepts any streaming
DataFrame with the Kafka record shape (key/value binary + metadata,
FIXTURES §1.2) so the full 3-hop pipeline is testable against
file-backed fixtures — same plans, same checkpoints, no broker.

Delivery semantics (T4, tightened per ADVICE r1): the staged append is
made replay-idempotent explicitly, not by claim — on Delta via
transactional ``txnAppId``/``txnVersion`` (a replayed ``batch_id`` is
skipped by the commit protocol); on the parquet emulation by writing
each micro-batch under a ``_batch_id``/``_schema_pair`` partition with
dynamic partition overwrite, so a replay after a crash between write
and checkpoint commit REWRITES the same partition instead of
duplicating rows.  The curated hop is idempotent by construction
(latest-per-key dedup + keyed MERGE absorbs replays).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from jibaro_spark.catalog import Catalog, Layer, TableRef
from jibaro_spark.codecs.confluent import (
    SchemaRegistry,
    decode_confluent_batch_pairs,
)
from jibaro_spark.io import read_stream, write_stream, write_table
from jibaro_spark.operators.cdc import cdc_merge_table
from jibaro_spark.session import has_kafka


def kafka_to_raw(
    spark: SparkSession,
    catalog: Catalog,
    topic: str,
    project: str,
    database: str,
    table: str,
    options: dict[str, str] | None = None,
) -> None:
    """Stream a Kafka topic into the raw layer, payload kept as opaque
    binary (reference ``cdc.py:15-51``).

    Applies ``options.items()`` — the reference iterated dict KEYS
    (``for k, v in options:``), crashing on any custom option
    (SURVEY §2.13); fixed here.
    """
    if not has_kafka(spark):
        raise RuntimeError(
            "kafka connector jar (spark-sql-kafka-0-10) not on the classpath"
        )
    s = catalog.settings
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", s.kafka_bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("maxOffsetsPerTrigger", str(s.max_offsets_per_trigger))
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    source_to_raw(reader.load(), catalog, project, database, table)


def source_to_raw(
    stream: DataFrame,
    catalog: Catalog,
    project: str,
    database: str,
    table: str,
) -> None:
    """Kafka-shaped streaming DataFrame → raw-layer table (binary
    payloads + metadata, no decode — raw layer = exact source bytes,
    reference ``cdc.py:38-51``)."""
    ref = TableRef(str(Layer.RAW), project, database, table)
    q = write_stream(stream, catalog, ref, output_mode="append")
    q.awaitTermination()


def raw_to_staged(
    spark: SparkSession,
    catalog: Catalog,
    project: str,
    database: str,
    table: str,
    registry: SchemaRegistry,
    content_type: str = "json",
    schema_resolver: Callable[[str, int], str] | None = None,
    on_unknown_schema: str = "error",
) -> None:
    """Decode Confluent-framed raw records into typed staged tables,
    schema-id-partitioned (reference ``cdc.py:54-88`` →
    ``avro_handler.py:99-138`` / ``protobuf_handler.py:136-180``).

    Per micro-batch: wire-format slice → distinct schema pairs →
    per-pair decode → idempotent append with schema evolution (K2).
    Replay safety (module docstring): Delta appends carry
    ``txnAppId``/``txnVersion=batch_id``; parquet appends land in a
    ``_batch_id``/``_schema_pair`` partition overwritten dynamically,
    so re-processing a micro-batch cannot duplicate staged rows.

    ``on_unknown_schema`` (r12): ``"error"`` (default) fails the
    micro-batch loudly on a frame whose schema id the registry cannot
    resolve; ``"keep"`` parks those pairs — raw binary payloads, ids,
    and Kafka metadata — in a ``{table}__dead_letter`` STAGED table
    (same idempotent-append discipline) so the stream keeps flowing
    and the frames replay after the registry is fixed; ``"skip"``
    drops them.  Dead-letter frames are recognized structurally: a
    BINARY payload column alongside a non-null schema id can only be
    an undecoded frame (decoded values are structs/strings; a
    tombstone-keep/keyless null binary carries a NULL id).
    """
    from pyspark.sql import functions as F

    from jibaro_spark.codecs.confluent import DECODERS
    from jibaro_spark.io import default_table_format

    _PY_CODECS = ("protobuf-python", "avro-python")
    if content_type in _PY_CODECS:
        # jar-free decode (codecs/proto_python.py / avro_python.py):
        # the resolver must return Spark StructType reader schemas
        if schema_resolver is None:
            raise ValueError(
                f"content_type={content_type!r} requires a schema_resolver "
                "returning StructType per (role, schema_id)"
            )
    elif content_type not in DECODERS:
        # validate eagerly — inside foreachBatch the error would be
        # silently skipped whenever the checkpoint yields an empty batch
        raise ValueError(
            f"unknown content_type {content_type!r}; known: "
            f"{sorted(DECODERS) + list(_PY_CODECS)}"
        )
    src = TableRef(str(Layer.RAW), project, database, table)
    dst = TableRef(str(Layer.STAGED), project, database, table)

    def _decoded_pairs(batch: DataFrame, scratch: str):
        # scratch enables pair_frames' staged route: a many-schema
        # batch (pairs > SPILL_THRESHOLD) is re-partitioned ONCE by
        # schema pair so each per-pair append reads only its own
        # partition directory — O(batch) total scan instead of
        # O(pairs × batch) (the 10k-distinct-id job storm, VERDICT
        # r11 #2); the common few-schema batch takes the direct
        # filters and never touches the scratch dir.
        if content_type == "protobuf-python":
            from jibaro_spark.codecs.proto_python import (
                decode_confluent_batch_protobuf_python,
            )

            return decode_confluent_batch_protobuf_python(
                batch, schema_resolver, scratch_dir=scratch,
                on_unknown_schema=on_unknown_schema,
            )
        if content_type == "avro-python":
            from jibaro_spark.codecs.avro_python import (
                decode_confluent_batch_avro_python,
            )

            return decode_confluent_batch_avro_python(
                batch, schema_resolver, scratch_dir=scratch,
                on_unknown_schema=on_unknown_schema,
            )
        return decode_confluent_batch_pairs(
            batch, registry, content_type, schema_resolver,
            scratch_dir=scratch,
            on_unknown_schema=on_unknown_schema,
        )

    def _rm(spark_, path: str) -> None:
        jvm = spark_.sparkContext._jvm
        conf = spark_.sparkContext._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        if fs.exists(p):
            fs.delete(p, True)

    def process(batch: DataFrame, batch_id: int) -> None:
        fmt = default_table_format(batch.sparkSession)
        scratch = f"{catalog.checkpoint_path(dst)}/_decode_scratch/{batch_id}"
        # a replayed batch may find a prior attempt's scratch — the
        # staged write is not idempotent (plain parquet write), so
        # clear it first; the appends themselves stay idempotent via
        # txn/dynamic-partition as documented above
        _rm(batch.sparkSession, scratch)
        try:
            pairs = _decoded_pairs(batch, scratch)
            _write_pairs(batch, batch_id, fmt, pairs)
        finally:
            _rm(batch.sparkSession, scratch)

    dlq = TableRef(str(Layer.STAGED), project, database, f"{table}__dead_letter")

    def _is_dead_letter(decoded: DataFrame, key_id, value_id) -> bool:
        types = dict(decoded.dtypes)
        return (value_id is not None and types.get("value") == "binary") or (
            key_id is not None and types.get("key") == "binary"
        )

    def _write_pairs(batch: DataFrame, batch_id: int, fmt: str, pairs) -> None:
        for (key_id, value_id), decoded in pairs:
            if _is_dead_letter(decoded, key_id, value_id):
                # undecodable pair (on_unknown_schema='keep'): park the
                # raw frames idempotently beside the staged table; they
                # replay through this hop once the registry resolves
                write_table(
                    decoded.withColumn("_batch_id", F.lit(batch_id))
                    .withColumn(
                        "_schema_pair", F.lit(f"{key_id}-{value_id}")
                    ),
                    catalog, dlq, mode="overwrite",
                    partition_by=["_batch_id", "_schema_pair"],
                    partitionOverwriteMode="dynamic",
                )
                continue
            if fmt == "delta":
                # txnAppId must be unique PER SCHEMA PAIR: Delta's idempotent
                # writes skip any txn whose version <= the last recorded
                # version for that appId, so a shared appId would keep only
                # the first pair's append in a multi-schema batch.
                write_table(
                    decoded, catalog, dst, mode="append", merge_schema=True,
                    txnAppId=(
                        f"raw_to_staged:{catalog.path(dst)}:{key_id}-{value_id}"
                    ),
                    txnVersion=str(batch_id),
                )
            else:
                write_table(
                    decoded.withColumn("_batch_id", F.lit(batch_id))
                    .withColumn("_schema_pair", F.lit(f"{key_id}-{value_id}")),
                    catalog, dst, mode="overwrite",
                    partition_by=["_batch_id", "_schema_pair"],
                    partitionOverwriteMode="dynamic",
                )

    stream = read_stream(
        spark, catalog, src,
        max_files_per_trigger=catalog.settings.max_files_per_trigger,
    )
    q = write_stream(stream, catalog, dst, foreach_batch=process)
    q.awaitTermination()


def staged_to_curated(
    spark: SparkSession,
    catalog: Catalog,
    project: str,
    database: str,
    table: str,
    key_cols: Sequence[str],
    order_by: Sequence[str] = ("timestamp",),
    post_hooks: Sequence[Callable[[SparkSession, Catalog, TableRef], Any]] = (),
) -> None:
    """Merge staged Debezium envelopes into the curated current-state
    table (reference ``cdc.py:91-269``): per micro-batch latest-per-key
    dedup + CDC MERGE; then maintenance hooks (compaction, history,
    manifest, vacuum — see :mod:`jibaro_spark.maintenance`)."""
    src = TableRef(str(Layer.STAGED), project, database, table)
    dst = TableRef(str(Layer.CURATED), project, database, table)

    def process(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        metrics = cdc_merge_table(
            spark, catalog, batch, dst, key_cols=list(key_cols), order_by=list(order_by)
        )
        # per-merge history row, the reference's cadence (cdc.py:224-247):
        # rowsWritten was observed by the merge's own write job — the
        # history append costs one file listing, never a second scan
        from jibaro_spark.maintenance import append_history_metrics

        append_history_metrics(
            spark,
            catalog,
            dst,
            operation=str((metrics or {}).get("operation", "MERGE")),
            extra={
                **{k: str(v) for k, v in (metrics or {}).items() if k != "operation"},
                "batchId": str(batch_id),
            },
        )

    stream = read_stream(
        spark, catalog, src,
        max_files_per_trigger=catalog.settings.max_files_per_trigger,
    )
    q = write_stream(stream, catalog, dst, foreach_batch=process)
    q.awaitTermination()
    for hook in post_hooks:
        hook(spark, catalog, dst)


def publish_table(
    spark: SparkSession,
    catalog: Catalog,
    ref: TableRef,
    key_cols: list[str],
    registry: SchemaRegistry,
    topic: str,
    content_type: str = "json",
    sink: Callable[[DataFrame], None] | None = None,
) -> DataFrame:
    """Reverse path — publish a table back in Confluent wire format
    (reference ``kafka.py:22-119``).  Returns the Kafka-shaped frame;
    ``sink`` defaults to the Kafka batch sink when the connector jar is
    present, else the caller consumes the returned DataFrame.
    """
    from jibaro_spark.codecs.confluent import encode_confluent
    from jibaro_spark.io import read_table

    df = read_table(spark, catalog, ref)
    if content_type == "avro-python":
        from jibaro_spark.codecs.avro_python import encode_confluent_avro_python

        framed = encode_confluent_avro_python(df, key_cols, registry, topic)
    elif content_type == "protobuf-python":
        from jibaro_spark.codecs.proto_python import (
            encode_confluent_protobuf_python,
        )

        framed = encode_confluent_protobuf_python(df, key_cols, registry, topic)
    else:
        framed = encode_confluent(df, key_cols, registry, topic, content_type)
    if sink is not None:
        sink(framed)
    elif has_kafka(spark):
        (
            framed.write.format("kafka")
            .option(
                "kafka.bootstrap.servers",
                catalog.settings.kafka_bootstrap_servers,
            )
            .option("topic", topic)
            .save()
        )
    return framed
