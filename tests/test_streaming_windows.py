"""Streaming event-time operators driven as REAL streams (file source →
availableNow → memory/foreachBatch sink), verified against the batch
formulation of the same computation — plus multimodal plumbing tests."""

from __future__ import annotations

import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import load_tables
from jibaro_spark.streaming import windows as W

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events fixture re-written as a clean micro-batchable parquet dir
    (ts normalized to TIMESTAMP so streaming needs no nanos conf)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_tables(spark, SF, "events")["events"]
    # repartition (not coalesce — a 1-partition source stays 1 file
    # under coalesce) so maxFilesPerTrigger=1 yields ≥2 micro-batches
    ev.repartition(2).write.mode("overwrite").parquet(out)
    return out


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(events_dir)


def _run_to_memory(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if sdf.isStreaming else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_tumbling_counts_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r.window_start, r.window_end, r.event_type): (r.n, r.total)
        for r in W.tumbling_counts(batch).collect()
    }

    sdf = W.tumbling_counts(_stream(spark, events_dir))
    q = (
        sdf.writeStream.format("memory")
        .queryName("tumbling")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_rows = spark.sql("SELECT * FROM tumbling").collect()
    got = {
        (r.window_start, r.window_end, r.event_type): (r.n, r.total)
        for r in got_rows
    }
    # append mode only emits windows the watermark has closed; every
    # emitted window must match the batch result exactly, and most
    # windows must have been finalized (only the trailing ones held).
    assert got, "stream produced no finalized windows"
    for k, v in got.items():
        assert expected[k] == v, (k, v, expected[k])
    assert len(got) >= len(expected) * 0.5


def test_hopping_counts_stream_equals_batch(spark, events_dir):
    """Hopping windows (30 min / 10 min slide): every event contributes
    to 3 windows; the streamed availableNow run finalizes the same
    window set with the same counts/totals as the batch formulation."""
    batch = spark.read.parquet(events_dir)
    expected = {
        (r.window_start, r.window_end): (r.n, r.total)
        for r in W.hopping_counts(batch).collect()
    }
    assert len(expected) > 3

    sdf = W.hopping_counts(_stream(spark, events_dir))
    _run_to_memory(sdf, "hopping")
    got = {
        (r.window_start, r.window_end): (r.n, r.total)
        for r in spark.table("hopping").collect()
    }
    # append mode only emits watermark-closed windows: every emitted
    # window matches batch exactly; only the trailing ones are held.
    assert got, "stream produced no finalized windows"
    for k, v in got.items():
        assert expected[k] == v, (k, v, expected[k])
    assert len(got) >= len(expected) * 0.5


def test_session_windows_stream_runs_and_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in W.session_windows(batch, gap="30 minutes").collect()
    }
    sdf = W.session_windows(_stream(spark, events_dir), gap="30 minutes")
    q = (
        sdf.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got
    for k, v in got.items():
        assert expected[k] == v


def test_watermark_drops_late_data(spark, tmp_path):
    """T5/T6 late-data policy: a row arriving after its window has been
    finalized (evicted in an earlier micro-batch) is DROPPED — the
    closed window is neither re-emitted nor corrected.

    Measured Spark semantics this pins: eviction happens at the END of
    the batch in which the watermark passes the window; a late row
    landing in that SAME batch still merges (merge precedes eviction),
    and only rows arriving in LATER batches are discarded — hence the
    three-file sequence below."""
    import datetime
    import time

    src = str(tmp_path / "late_events")
    schema = "ts timestamp, event_type string, value double"

    def write(*ts):
        spark.createDataFrame(
            [(datetime.datetime.fromisoformat(t), "x", 1.0) for t in ts],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtime → file-source batch ordering

    # batch 0: [10:00,11:00) gets a row; 20:00 will push the watermark
    # to 18:00 at commit
    write("2026-01-01 10:00:00", "2026-01-01 20:00:00")
    # batch 1: watermark 18:00 in effect → [10:00,11:00) finalized
    # with n=1 and evicted; 23:00 pushes the watermark to 21:00
    write("2026-01-01 23:00:00")
    # batch 2: 10:30 targets the already-evicted window → dropped;
    # 23:30 keeps the stream advancing
    write("2026-01-01 10:30:00", "2026-01-01 23:30:00")

    sdf = W.tumbling_counts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        window="1 hour",
        watermark="2 hours",
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.window_start.strftime("%H:%M"): r.n
        for r in spark.sql("SELECT * FROM late_drop").collect()
    }
    # the 10:00 window was finalized with ONE row; the late 10:30 row
    # never surfaced — no duplicate emission, no correction
    assert got == {"10:00": 1, "20:00": 1}, got


def test_running_counts_stateful_across_batches(spark, events_dir):
    """applyInPandasWithState: state must accumulate across micro-batches
    (maxFilesPerTrigger=1 over a 2-file dir → ≥2 batches); the final
    update row per key equals the batch aggregate."""
    batch = spark.read.parquet(events_dir)
    expected = {
        r.user_id: (r["count"], r.total)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("count"),
            F.round(F.sum("value"), 6).alias("total"),
        )
        .collect()
    }

    sdf = W.running_counts(_stream(spark, events_dir))
    rows = []
    q = (
        sdf.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: rows.append((bid, df.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(rows) >= 2, "expected multiple micro-batches"
    final = {}
    for _, batch_rows in rows:
        for r in batch_rows:
            final[r.user_id] = (r["count"], r.total)
    assert set(final) == set(expected)
    for k in expected:
        assert final[k][0] == expected[k][0]
        assert abs(final[k][1] - expected[k][1]) < 1e-6


def test_multimodal_stub_and_fake(spark):
    from jibaro_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0data", ("image", "image/jpeg", None, None, None, None)),
         (2, b"\x89PNG\r\n", ("image", "image/png", 10, 20, None, None))],
        f"id int, content binary, media {mm.MEDIA_STRUCT.simpleString()}",
    )
    # stub decoder raises with guidance
    with pytest.raises(Exception) as ei:
        mm.decode_media(df).collect()
    assert "NotImplementedError" in str(ei.value) or "decoder" in str(ei.value)

    out = {r.id: r for r in mm.decode_media(df, decoder=mm.fake_decoder).collect()}
    assert out[2].dec_width == 10 and out[2].dec_height == 20  # metadata wins
    assert 1 <= out[1].dec_width <= 64  # derived deterministically
    assert 0.0 <= out[1].dec_mean_luma <= 1.0

    stats = {r.id: r for r in mm.content_stats(df).collect()}
    assert stats[1].sniffed_mime == "image/jpeg"
    assert stats[2].sniffed_mime == "image/png"

    # resize: real-kernel path raises with guidance AT EXECUTION (the
    # plumbing itself builds a valid plan); the fake kernel drives the
    # full Arrow path — exact output sizing, metadata rewrite,
    # non-image passthrough, deterministic bytes.
    with pytest.raises(Exception) as ei:
        mm.resize_images(df, 64, 64).collect()
    assert "NotImplementedError" in str(ei.value) or "resize" in str(ei.value)

    mixed = spark.createDataFrame(
        [(1, b"\xff\xd8\xff\xe0data", ("image", "image/jpeg", 100, 50, None, None)),
         (2, b"RIFFxxxx", ("audio", "audio/wav", None, None, 16000, 2500)),
         (3, None, ("image", "image/png", 8, 8, None, None))],
        f"id int, content binary, media {mm.MEDIA_STRUCT.simpleString()}",
    )
    rs = {
        r.id: r
        for r in mm.resize_images(
            mixed, 16, 12, resizer=mm.fake_resizer
        ).collect()
    }
    assert len(bytes(rs[1].content)) == 16 * 12
    assert (rs[1].media.width, rs[1].media.height) == (16, 12)
    assert bytes(rs[2].content) == b"RIFFxxxx"  # non-image untouched
    assert (rs[2].media.sample_rate, rs[2].media.duration_ms) == (16000, 2500)
    assert rs[3].content is None  # null payload passes through
    rs2 = {
        r.id: bytes(r.content)
        for r in mm.resize_images(mixed, 16, 12, resizer=mm.fake_resizer).collect()
        if r.content is not None
    }
    assert bytes(rs[1].content) == rs2[1]  # deterministic


def test_interval_join_stream_stream_equals_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    clicks_b = batch.filter(F.col("event_type") == "click")
    buys_b = batch.filter(F.col("event_type") == "purchase")
    expected = {
        (r.event_id, r.r_event_id)
        for r in W.interval_join(
            buys_b, clicks_b, key="user_id", lower="30 minutes", upper="0 seconds"
        ).collect()
    }
    assert expected, "batch interval join empty — fixture degenerate"

    s = _stream(spark, events_dir)
    sdf = W.interval_join(
        s.filter(F.col("event_type") == "purchase"),
        s.filter(F.col("event_type") == "click"),
        key="user_id",
        lower="30 minutes",
        upper="0 seconds",
    )
    assert sdf.isStreaming
    _run_to_memory(sdf, "ssjoin")
    got = {
        (r.event_id, r.r_event_id)
        for r in spark.sql("SELECT * FROM ssjoin").collect()
    }
    # stream-stream inner join with availableNow processes everything;
    # every emitted pair must be a true pair, and the join must emit
    # (at minimum) all pairs the watermark fully closed
    assert got == expected


def test_interval_join_rejects_mixed_modes(spark, events_dir):
    with pytest.raises(ValueError, match="both"):
        W.interval_join(
            _stream(spark, events_dir), spark.read.parquet(events_dir), key="user_id"
        )


def test_dedup_within_watermark_drops_in_window_duplicates(spark, tmp_path):
    """Feed a stream whose second micro-batch replays rows from the
    first (within the watermark): the replayed keys must be dropped,
    and every key emitted exactly once."""
    out = str(tmp_path / "dup_stream")
    ev = load_tables(spark, SF, "events")["events"].limit(200).cache()
    # batch 1 = rows as-is; batch 2 = first 100 rows replayed (dups)
    ev.write.mode("overwrite").parquet(out + "/b1")
    ev.limit(100).write.mode("overwrite").parquet(out + "/b2")
    schema = spark.read.parquet(out + "/b1").schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(out + "/{b1,b2}")
    )
    deduped = W.dedup_within_watermark(sdf, keys=["event_id"], watermark="10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT event_id, COUNT(*) c FROM wm_dedup GROUP BY 1").collect()
    n_total = ev.count()
    assert len(got) == n_total, f"expected {n_total} distinct keys, got {len(got)}"
    assert all(r.c == 1 for r in got), "a duplicate key was emitted twice"
    ev.unpersist()


def test_windows_with_rocksdb_state_store(spark, events_dir):
    """Same windowed aggregation, RocksDB state store (the provider a
    100 TB streaming job needs: state spills to disk instead of
    executor heap).  Results must be identical to the default
    (HDFS-backed in-memory) provider's batch equivalent."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, "")
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sdf = W.tumbling_counts(_stream(spark, events_dir))
        q = (
            sdf.writeStream.format("memory")
            .queryName("rocksdb_tumbling")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    got = {
        (r.window_start, r.window_end, r.event_type): (r.n, r.total)
        for r in spark.sql("SELECT * FROM rocksdb_tumbling").collect()
    }
    assert got, "no finalized windows under RocksDB provider"
    batch = spark.read.parquet(events_dir)
    expected = {
        (r.window_start, r.window_end, r.event_type): (r.n, r.total)
        for r in W.tumbling_counts(batch).collect()
    }
    for k, v in got.items():
        assert expected[k] == v, k


def test_transform_with_state_running_totals(spark, events_dir):
    """Spark 4 transformWithStateInPandas running totals: final per-key
    state equals the batch aggregate (RocksDB provider required)."""
    if not W.has_tws():
        pytest.skip("google.protobuf unavailable — tws state protocol needs it")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, "")
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        sdf = W.running_totals_tws(_stream(spark, events_dir))
        q = (
            sdf.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    rows = spark.sql(
        "SELECT user_id, count, total FROM tws_totals"
    ).collect()
    # update-mode may emit once per micro-batch; the LAST emission per
    # key is the final state — memory sink appends in order, so take
    # the last row per user
    final = {}
    for r in rows:
        # r["count"]: attribute access collides with Row.count() method
        final[r.user_id] = (r["count"], r.total)
    batch = spark.read.parquet(events_dir)
    expected = {
        r.user_id: (r.n, r.total)
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
        )
        .collect()
    }
    assert set(final) == set(expected)
    for u, (n, tot) in expected.items():
        gn, gtot = final[u]
        assert gn == n, (u, gn, n)
        assert abs(gtot - tot) < 1e-4, (u, gtot, tot)


def test_stream_static_enrichment_join(spark, events_dir, tmp_path):
    """Stream-static join — the enrichment pattern (streaming facts ×
    static dimension): the static side is re-read per micro-batch and
    needs NO watermark or state; results equal the batch join."""
    dim = spark.createDataFrame(
        [(i, f"seg_{i % 3}") for i in range(200)], "user_id long, segment string"
    )
    dim_dir = str(tmp_path / "dim")
    dim.write.parquet(dim_dir)
    static = spark.read.parquet(dim_dir)

    sdf = _stream(spark, events_dir)
    enriched = sdf.join(static, "user_id", "left").groupBy("segment").count()
    q = (
        enriched.writeStream.format("memory")
        .queryName("stream_static_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["segment"]: r["count"]
        for r in spark.sql("SELECT * FROM stream_static_out").collect()
    }
    batch = spark.read.parquet(events_dir)
    expected = {
        r["segment"]: r["count"]
        for r in batch.join(static, "user_id", "left")
        .groupBy("segment")
        .count()
        .collect()
    }
    assert got == expected and got, got


def test_interval_join_left_outer_stream_emits_after_watermark(spark, tmp_path):
    """Streaming LEFT OUTER stream-stream join: an unmatched left row
    is emitted with null right columns only after the watermark passes
    its join window; matched rows pair normally.  Three-file sequence
    mirrors test_watermark_drops_late_data's eviction mechanics."""
    import datetime
    import time

    src = str(tmp_path / "oj_events")
    schema = "ts timestamp, event_type string, user_id int"

    def write(rows):
        spark.createDataFrame(
            [(datetime.datetime.fromisoformat(t), e, u) for t, e, u in rows],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    # batch 0: user 1 purchase has a click 10 min earlier (match);
    # user 2 purchase has NO click anywhere
    write(
        [
            ("2026-01-01 10:00:00", "click", 1),
            ("2026-01-01 10:10:00", "purchase", 1),
            ("2026-01-01 10:10:00", "purchase", 2),
        ]
    )
    # batch 1: far-future rows push the watermark well past 10:10 on
    # BOTH sides → user 2's join window closes → null-joined emission
    write(
        [
            ("2026-01-02 10:00:00", "click", 9),
            ("2026-01-02 10:00:05", "purchase", 9),
        ]
    )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    sdf = W.interval_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
        key="user_id",
        lower="30 minutes",
        upper="0 seconds",
        watermark="1 hour",
        how="left_outer",
    )
    assert sdf.isStreaming
    _run_to_memory(sdf, "oj")
    rows = spark.sql("SELECT user_id, r_user_id FROM oj").collect()
    got = {(r.user_id, r.r_user_id) for r in rows}
    assert (1, 1) in got, got          # matched pair
    assert (2, None) in got, got       # watermark-closed unmatched left
    # batch semantics agree on the same data
    batch = spark.read.parquet(src)
    bdf = W.interval_join(
        batch.filter(F.col("event_type") == "purchase"),
        batch.filter(F.col("event_type") == "click"),
        key="user_id",
        lower="30 minutes",
        upper="0 seconds",
        how="left_outer",
    )
    bgot = {(r.user_id, r.r_user_id) for r in bdf.collect()}
    assert {(1, 1), (2, None)} <= bgot


def test_interval_join_rejects_bad_how(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    with pytest.raises(ValueError, match="how must be"):
        W.interval_join(batch, batch, key="user_id", how="cross")


def test_bottomk_sample_stream_equals_batch_exactly(spark, events_dir):
    """The md5 bottom-k sketch is a pure function of the distinct item
    set — the STREAMING result (2+ micro-batches) must equal the batch
    kernel and the declarative SQL form EXACTLY, row for row."""
    batch = spark.read.parquet(events_dir)
    bdf = W.streaming_bottomk_sample(batch, "event_type", "user_id", k=16)
    expected = {
        (r["event_type"], r["user_id"], r["priority"]) for r in bdf.collect()
    }
    assert expected

    sdf = W.streaming_bottomk_sample(
        _stream(spark, events_dir), "event_type", "user_id", k=16
    )
    assert sdf.isStreaming
    _run_to_memory(sdf, "bottomk")
    # append mode emits one snapshot per (group, micro-batch): the
    # LAST snapshot per group is the final sketch. Reconstruct it by
    # keeping, per group, the k smallest priorities ever emitted —
    # equivalent because snapshots are monotone under union+truncate.
    rows = spark.sql("SELECT * FROM bottomk").collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["event_type"], {})[r["user_id"]] = r["priority"]
    got = set()
    for g, pool in by_grp.items():
        for uid, pri in sorted(pool.items(), key=lambda kv: (kv[1], kv[0]))[:16]:
            got.add((g, uid, pri))
    assert got == expected


def test_bottomk_rejects_bad_k(spark, events_dir):
    with pytest.raises(ValueError, match="k must be"):
        W.streaming_bottomk_sample(
            spark.read.parquet(events_dir), "event_type", "user_id", k=0
        )
