"""Event-time streaming operators ([ext] — SURVEY §2.10 T5: the
reference has no watermarks/windows; these are the Structured-Streaming
operators a 100 TB event pipeline needs).

All functions take a streaming OR batch DataFrame — the expressions are
identical; only the sink differs.  Watermarks bound state: without one,
a windowed aggregation's state grows forever (T6 late-data policy).
"""

from __future__ import annotations

import os
import sys
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: state timeout for the custom stateful operator (see running_counts)
_STATE_SCHEMA = "count bigint, total double"


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window aggregation with a watermark.

    Late rows beyond ``watermark`` are dropped (deterministic late-data
    policy); state per window is finalized and evicted once the
    watermark passes the window end — bounded state at any scale.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            group_col,
            "n",
            "total",
        )
    )


def hopping_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "30 minutes",
    slide: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Hopping (sliding) event-time windows: each row lands in
    ``window/slide`` overlapping windows — map-side expansion, then the
    same watermarked grouped aggregation as :func:`tumbling_counts`.
    State is bounded by (active windows × groups); a window finalizes
    when the watermark passes its end.  Batch form declared as
    ``q_sliding_windows`` (oracle-checked); stream-vs-batch equality
    pinned in tests.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n",
            "total",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows: activity runs per key closed by ``gap`` of
    inactivity (``F.session_window`` — dynamic, data-driven windows;
    the streaming analogue of the batch sessionization query)."""
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str = "2 hours",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join: pair each left row with right rows of
    the same ``key`` whose timestamp falls in
    ``[left_ts − lower, left_ts + upper]``.

    Batch or streaming with one code path.  Streaming is the
    stream-stream join: both sides get watermarks and the BOUNDED time
    condition — exactly what lets Spark evict join state (an unbounded
    stream-stream join would buffer both streams forever; with the
    bound, state per side is ``watermark + interval`` of data).

    ``how`` ∈ {inner, left_outer, right_outer, full_outer}: the outer
    forms are the "did NOT convert / was never clicked" workloads.
    Streaming outer semantics (pinned by test): an unmatched row is
    emitted with nulls only AFTER the watermark passes its join
    window — Spark cannot know "no match will come" any earlier, so
    outer results near the head of the stream trail by the watermark.

    Right columns are prefixed with ``right_prefix`` (stream-stream
    self-joins share column names).
    """
    allowed = {"inner", "left_outer", "right_outer", "full_outer"}
    if how not in allowed:
        raise ValueError(f"interval_join: how must be one of {sorted(allowed)}")
    if left.isStreaming != right.isStreaming:
        raise ValueError("interval_join: both sides must be batch or both streams")
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    r = right.select([F.col(c).alias(f"{right_prefix}{c}") for c in right.columns])
    rk, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rk))
        & (F.col(rts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(r, cond, how)


def running_counts(
    events: DataFrame,
    key_col: str = "user_id",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-key running (count, total) maintained across micro-batches —
    the escape hatch for operators Spark's built-ins can't express
    (reference has nothing comparable; this is the [ext] pattern for
    e.g. CDC-aware sessionization or per-entity rate limiting).

    State is a single (count,total) pair per key: O(distinct keys)
    state, Arrow-batched updates.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} bigint, count bigint, total double"

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):  # noqa: F821
        import pandas as pd

        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            tot += float(pdf["value"].sum())
        state.update((n, tot))
        yield pd.DataFrame(
            {key_col: [key[0]], "count": [n], "total": [round(tot, 6)]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes its event time, then evicts it — unlike plain
    ``dropDuplicates`` on a stream, whose key state grows forever.

    Guarantee: duplicates arriving within the watermark interval of the
    first sighting are dropped; a duplicate arriving later than the
    watermark may be re-emitted (the at-least-once trade that keeps
    state finite at 100 TB/day event volumes).  On a batch frame this
    degrades to ``dropDuplicates(keys)`` for the batch-equivalence
    oracle.
    """
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


#: Known on-disk locations of a pure-Python ``google.protobuf`` runtime
#: on hosts where the pip package is absent (no-network sandboxes ship
#: one inside the Google Cloud SDK's App Engine platform dir).
_PROTOBUF_RUNTIME_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def has_tws() -> bool:
    """True when transformWithStateInPandas can run: its state-server
    protocol needs a working ``google.protobuf`` on the Python side."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def enable_tws_runtime() -> bool:
    """Best-effort enablement of the ``transformWithStateInPandas``
    protobuf dependency WITHOUT installing anything: if
    ``google.protobuf`` is not importable, look for a known on-disk
    pure-Python runtime (:data:`_PROTOBUF_RUNTIME_PATHS`) and add it to
    BOTH ``sys.path`` (driver) and ``$PYTHONPATH`` (inherited by the
    JVM and its Python workers — so this must run BEFORE the
    SparkSession is built for executors to see it).

    The SDK-vendored runtime may trail pyspark's generated
    ``StateMessage_pb2`` by a minor version; protobuf's own documented
    escape hatch (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) is
    set for that case — acceptable for the simple state-protocol
    messages involved, and scoped to environments that lack the real
    package (the env var is only set when the fallback path is used).

    Returns the post-enablement :func:`has_tws` state.  Callers that
    get ``False`` keep the :func:`running_counts`
    (``applyInPandasWithState``) custom-stateful path.
    """
    if has_tws():
        return True
    for p in _PROTOBUF_RUNTIME_PATHS:
        if not os.path.isdir(os.path.join(p, "google", "protobuf")):
            continue
        if p not in sys.path:
            sys.path.insert(0, p)
        existing = os.environ.get("PYTHONPATH", "")
        if p not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                p + (os.pathsep + existing if existing else "")
            )
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        if has_tws():
            return True
    return False


def running_totals_tws(
    events: DataFrame,
    key_col: str = "user_id",
) -> DataFrame:
    """Per-key running (count, total) via ``transformWithStateInPandas``
    — Spark 4's arbitrary-stateful API (successor to
    ``applyInPandasWithState``, cf. :func:`running_counts`): typed
    value state, explicit handle lifecycle, RocksDB-only state store
    (the provider a 100 TB stateful job runs anyway — state spills to
    disk, changelog-checkpoints incrementally).

    Semantics are identical to :func:`running_counts`; the test suite
    pins stream-vs-batch equality for both so either API can carry the
    custom-stateful surface.

    Gated on ``google.protobuf`` (the worker↔JVM state protocol is
    protobuf-encoded in Spark 4.1) — probe with :func:`has_tws`, or
    call :func:`enable_tws_runtime` BEFORE building the session to use
    an on-disk pure-Python runtime where the pip package is absent.
    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) — TWS state uses
    multiple column families, which HDFSBackedStateStoreProvider
    rejects.  Environments where neither is available keep the
    ``applyInPandasWithState`` path.

    .. note:: Previously marked experimental (ADVICE r3: no recorded
       run).  As of round 5 ``test_transform_with_state_running_totals``
       executes un-skipped here — streaming parquet source → TWS →
       memory sink on RocksDB, final state equal to the batch
       aggregate — via :func:`enable_tws_runtime`'s discovered
       protobuf runtime.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, tot = self._agg.get() if self._agg.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                tot += float(pdf["value"].sum())
            self._agg.update((n, tot))
            yield pd.DataFrame(
                {key_col: [key[0]], "count": [n], "total": [round(tot, 6)]}
            )

        def close(self) -> None:
            pass

    out_schema = f"{key_col} bigint, count bigint, total double"
    return events.groupBy(key_col).transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


def streaming_semantic_dedup(
    events: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float = 0.95,
    max_state_per_cell: int = 4096,
) -> DataFrame:
    """Streaming semantic dedup via ``applyInPandasWithState``: admit a
    vector only if no previously-admitted vector in its coarse cell has
    cosine ≥ ``threshold`` — the STREAMING form of the cell-partitioned
    SemDeDup pipeline (:func:`jibaro_spark.operators.similarity.
    embedding_near_duplicates_cells`), deduplicating ACROSS
    micro-batches: a replica arriving hours after its original is still
    flagged, something per-batch dedup cannot do.

    State per cell = the admitted (id, vector) list, FIFO-capped at
    ``max_state_per_cell`` (admission beyond the cap is best-effort —
    the bounded-state trade every streaming dedup makes, cf.
    :func:`dedup_within_watermark`).  Cells bound both state size and
    comparison cost: each arrival is scored against ONE cell's
    admitted set with a vectorized matmul, not the corpus.

    Determinism: arrivals are processed in ``id_col`` order within each
    (cell, micro-batch) group, and the matched duplicate is the
    earliest-admitted (lowest state index) above threshold.

    Output rows: ``(id, cell, is_dup, dup_of)`` — ``dup_of`` null for
    admitted rows.  On a batch frame the SAME greedy kernel runs per
    cell through plain ``applyInPandas`` (one "micro-batch", empty
    initial state — ``applyInPandasWithState`` is streaming-only),
    which the stream-vs-batch equality test exploits.
    """
    from jibaro_spark.operators.similarity import _nearest_cells

    # NULL ids/vectors are not deduplicable rows: a NULL vector has no
    # cell (NULL grouping key) and would crash the kernel's int()/
    # asarray coercions — same pre-kernel contract as the bottom-k and
    # SpaceSaving kernels.
    src = events.filter(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    ).select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__vec"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0]
        .cast("int")
        .alias("__cell"),
    )
    out_schema = f"{id_col} bigint, cell int, is_dup boolean, dup_of bigint"
    state_schema = "ids array<bigint>, vecs array<array<double>>"

    def _greedy(cell_val, ids, M, pdf):
        import numpy as np
        import pandas as pd

        out_id, out_dup, out_of = [], [], []
        if pdf is not None:
            for _id, v in zip(pdf["__id"], pdf["__vec"]):
                x = np.asarray(v, dtype=np.float64)
                if M.size == 0:
                    M = x.reshape(1, -1).copy()
                    ids = [int(_id)]
                    out_id.append(int(_id)); out_dup.append(False); out_of.append(None)
                    continue
                nx = np.linalg.norm(x) or 1.0
                norms = np.linalg.norm(M, axis=1)
                norms[norms == 0] = 1.0
                sims = (M @ x) / (norms * nx)
                hit = np.nonzero(sims >= threshold)[0]
                if len(hit):
                    out_id.append(int(_id)); out_dup.append(True)
                    out_of.append(int(ids[int(hit[0])]))
                else:
                    M = np.vstack([M, x.reshape(1, -1)])
                    ids.append(int(_id))
                    out_id.append(int(_id)); out_dup.append(False); out_of.append(None)
            if len(ids) > max_state_per_cell:
                drop = len(ids) - max_state_per_cell
                ids, M = ids[drop:], M[drop:]
        out = pd.DataFrame(
            {
                id_col: pd.Series(out_id, dtype="int64"),
                "cell": int(cell_val),
                "is_dup": pd.Series(out_dup, dtype="bool"),
                "dup_of": pd.Series(out_of, dtype="object"),
            }
        )
        return ids, M, out

    if not events.isStreaming:
        def batch_kernel(key, pdf):
            import numpy as np

            _, _, out = _greedy(
                key[0], [], np.zeros((0, 0), dtype=np.float64),
                pdf.sort_values("__id"),
            )
            return out

        return src.groupBy("__cell").applyInPandas(batch_kernel, out_schema)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        if state.exists:
            st_ids, st_vecs = state.get
            ids = list(st_ids)
            M = np.array([list(v) for v in st_vecs], dtype=np.float64)
        else:
            ids, M = [], np.zeros((0, 0), dtype=np.float64)
        batches = [p for p in pdfs]
        pdf = pd.concat(batches).sort_values("__id") if batches else None
        ids, M, out = _greedy(key[0], ids, M, pdf)
        state.update((ids, [list(map(float, r)) for r in M]))
        yield out

    return src.groupBy("__cell").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_space_saving(
    events: DataFrame,
    group_col: str,
    item_col: str,
    order_col: str,
    m: int = 64,
) -> DataFrame:
    """Bounded-state heavy hitters per group via the SpaceSaving
    algorithm (Metwally et al., ICDT'05) in ``applyInPandasWithState``:
    each group keeps at most ``m`` (item, count, error) counters ACROSS
    micro-batches.  On arrival: increment a tracked item; start a new
    counter while capacity remains; otherwise evict the minimum counter
    (ties: lexicographically smallest item) and inherit its count as
    the newcomer's ``max_error``.

    SpaceSaving guarantees — pinned by tests, they hold per group at
    any stream length N with O(m) state:

    * ``est_count >= true_count`` (never undercounts);
    * ``est_count - max_error <= true_count`` (bounded overcount);
    * every item with ``true_count > N/m`` is tracked.

    Determinism: rows are processed in ``order_col`` order (ties by
    ``item_col``) within each (group, micro-batch); with ``m`` >= the
    group's distinct-item count the counters are EXACT counts, which is
    what the declared batch twin (``q_space_saving_batch``) exploits
    for its SQL oracle.

    Output per micro-batch: one row per live counter —
    ``(group, item, est_count, max_error)`` — the group's current
    sketch snapshot (append mode; the latest snapshot per group is the
    answer).  On a batch frame the same kernel runs once through
    ``applyInPandas`` with empty initial state.

    At 100 TB: state is ``groups × m`` counters regardless of stream
    volume; each micro-batch shuffles once on ``group_col``.  This is
    the streaming companion of the mergeable CMS/KMV/HLL sketch family
    (``operators/sketches.py``) — SpaceSaving answers top-k, the
    sketches answer frequency/cardinality.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    # NULL items would reach the kernel as None and crash the
    # lexicographic tie-breaks (None vs str in the eviction min / the
    # snapshot sort) — same contract as streaming_bottomk_sample:
    # NULL is not a countable item.
    src = events.select(
        F.col(group_col).alias("__grp"),
        F.col(item_col).cast("string").alias("__item"),
        F.col(order_col).alias("__ord"),
    ).filter(F.col("__item").isNotNull())
    out_schema = (
        f"{group_col} string, {item_col} string, est_count bigint, "
        "max_error bigint"
    )
    state_schema = "items array<string>, counts array<long>, errors array<long>"

    def _apply(grp, items, counts, errors, pdf):
        import pandas as pd

        tbl = {it: (c, e) for it, c, e in zip(items, counts, errors)}
        if pdf is not None:
            for it in pdf.sort_values(["__ord", "__item"])["__item"]:
                if it in tbl:
                    c, e = tbl[it]
                    tbl[it] = (c + 1, e)
                elif len(tbl) < m:
                    tbl[it] = (1, 0)
                else:
                    evict = min(tbl.items(), key=lambda kv: (kv[1][0], kv[0]))
                    mn = evict[1][0]
                    del tbl[evict[0]]
                    tbl[it] = (mn + 1, mn)
        snap = sorted(tbl.items(), key=lambda kv: (-kv[1][0], kv[0]))
        out = pd.DataFrame(
            {
                group_col: pd.Series([str(grp)] * len(snap), dtype="object"),
                item_col: pd.Series([k for k, _ in snap], dtype="object"),
                "est_count": pd.Series([v[0] for _, v in snap], dtype="int64"),
                "max_error": pd.Series([v[1] for _, v in snap], dtype="int64"),
            }
        )
        return (
            [k for k, _ in snap],
            [v[0] for _, v in snap],
            [v[1] for _, v in snap],
            out,
        )

    if not events.isStreaming:
        def batch_kernel(key, pdf):
            _, _, _, out = _apply(key[0], [], [], [], pdf)
            return out

        return src.groupBy("__grp").applyInPandas(batch_kernel, out_schema)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            items, counts, errors = state.get
            items, counts, errors = list(items), list(counts), list(errors)
        else:
            items, counts, errors = [], [], []
        batches = [p for p in pdfs]
        pdf = pd.concat(batches) if batches else None
        items, counts, errors, out = _apply(key[0], items, counts, errors, pdf)
        state.update((items, counts, errors))
        yield out

    return src.groupBy("__grp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_bottomk_sample(
    events: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 32,
) -> DataFrame:
    """Bounded-state deterministic DISTINCT-item sample per group via
    the bottom-k (KMV) construction in ``applyInPandasWithState``:
    keep the k items whose md5 priorities are smallest, across
    micro-batches.

    Why bottom-k instead of a classic reservoir: the md5 priority
    makes the sample a pure FUNCTION OF THE DISTINCT ITEM SET — order-
    independent and duplicate-insensitive — so the streaming sketch is
    EXACTLY equal to the batch twin on the same data (pinned by test;
    a randomized reservoir can only be equal in distribution), two
    sketches merge by union+truncate, and the k-th smallest priority
    doubles as a KMV cardinality estimator.  This is the uniform-
    sample companion of :func:`streaming_space_saving` (top-k by
    frequency) — together they cover "what's hot" and "what's
    typical" with O(k) state per group.

    Output per micro-batch: the group's current sample snapshot
    ``(group, item, priority)`` (append mode; latest snapshot per
    group is the answer).  Batch frames run the same kernel through
    ``applyInPandas``.  At 100 TB: state is ``groups × k`` strings,
    one group-keyed shuffle per micro-batch.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import hashlib

    # NULL items would reach the kernel as None and crash ``.encode()``;
    # a NULL is not a distinct item of the sample, so drop it up front.
    src = events.select(
        F.col(group_col).alias("__grp"),
        F.col(item_col).cast("string").alias("__item"),
    ).filter(F.col("__item").isNotNull())
    out_schema = f"{group_col} string, {item_col} string, priority string"
    state_schema = "prios array<string>, items array<string>"

    def _apply(grp, prios, items, pdf):
        import pandas as pd

        pool = dict(zip(items, prios))
        if pdf is not None:
            for it in pdf["__item"].unique():
                if it not in pool:
                    pool[it] = hashlib.md5(it.encode()).hexdigest()
        snap = sorted(pool.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        out = pd.DataFrame(
            {
                group_col: pd.Series([str(grp)] * len(snap), dtype="object"),
                item_col: pd.Series([i for i, _ in snap], dtype="object"),
                "priority": pd.Series([p for _, p in snap], dtype="object"),
            }
        )
        return [p for _, p in snap], [i for i, _ in snap], out

    if not events.isStreaming:
        def batch_kernel(key, pdf):
            _, _, out = _apply(key[0], [], [], pdf)
            return out

        return src.groupBy("__grp").applyInPandas(batch_kernel, out_schema)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            prios, items = state.get
            prios, items = list(prios), list(items)
        else:
            prios, items = [], []
        batches = [p for p in pdfs]
        pdf = pd.concat(batches) if batches else None
        prios, items, out = _apply(key[0], prios, items, pdf)
        state.update((prios, items))
        yield out

    return src.groupBy("__grp").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
