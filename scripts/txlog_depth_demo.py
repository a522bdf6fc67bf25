"""Deep-transaction-log demo (VERDICT r8 item 8): drive a streaming-style
commit loop far past the checkpoint cadence, then measure the read-path
properties the docstrings claim — at DEPTH, not at toy history.

What it runs (default 120 micro-batch commits, 12 checkpoint intervals):

1. a foreachBatch-shaped loop: every commit carries a (txn_app,
   txn_version) watermark, exactly like the streaming sink path;
2. `snapshot_files` at head, measured WITH checkpoints vs with the
   checkpoint resolution disabled (forced full replay) — the O(interval)
   vs O(history) gap;
3. `latest_txn_version` cold-start for a NEVER-seen app — must stop at
   the newest checkpoint, not scan the history;
4. `_last_checkpoint` pointer resolution vs the directory-listing
   fallback;
5. `vacuum_versioned` checkpoint pruning: checkpoint-file population
   before/after, and retained reads stay exact.

Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jibaro_spark import txlog  # noqa: E402
from jibaro_spark.session import build_session  # noqa: E402

N_COMMITS = int(os.environ.get("TXLOG_DEMO_COMMITS", "120"))
ROWS_PER = 1000


@contextmanager
def timer():
    t = [0.0]
    t0 = time.perf_counter()
    yield t
    t[0] = time.perf_counter() - t0


def main() -> None:
    spark = build_session(app_name="txlog_depth_demo", shuffle_partitions=8)
    root = tempfile.mkdtemp(prefix="txlog_depth_")
    table = os.path.join(root, "events")
    os.makedirs(table, exist_ok=True)
    out: dict = {"commits": N_COMMITS, "interval": txlog.CHECKPOINT_INTERVAL}

    # -- 1. the commit loop (streaming-sink shape: app watermark per batch)
    t0 = time.perf_counter()
    for b in range(N_COMMITS):
        df = spark.range(b * ROWS_PER, (b + 1) * ROWS_PER).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        txlog.write_versioned(
            df.coalesce(1),
            table,
            mode="append",
            txn_app="demo_stream",
            txn_version=b,
        )
    out["commit_loop_s"] = round(time.perf_counter() - t0, 2)
    head = txlog.latest_version(table)
    assert head == N_COMMITS - 1, head

    logdir = os.path.join(table, txlog.LOG_DIR)

    def ckpt_versions() -> list[int]:
        return sorted(
            int(f[: -len(".checkpoint.json")])
            for f in os.listdir(logdir)
            if f.endswith(".checkpoint.json")
        )

    out["checkpoints_before_vacuum"] = len(ckpt_versions())

    # -- 2. snapshot resolution: checkpointed vs forced-full-replay
    reps = 25
    with timer() as t_ck:
        for _ in range(reps):
            files = txlog.snapshot_files(table)
    out["snapshot_ms_checkpointed"] = round(t_ck[0] / reps * 1000, 2)
    out["live_files"] = len(files)

    real = txlog._latest_checkpoint_at_or_below
    try:
        txlog._latest_checkpoint_at_or_below = lambda *_: None
        with timer() as t_full:
            for _ in range(reps):
                files_full = txlog.snapshot_files(table)
    finally:
        txlog._latest_checkpoint_at_or_below = real
    out["snapshot_ms_full_replay"] = round(t_full[0] / reps * 1000, 2)
    assert files == files_full, "checkpointed replay must equal full replay"
    out["snapshot_speedup"] = round(
        out["snapshot_ms_full_replay"] / max(out["snapshot_ms_checkpointed"], 1e-9), 1
    )

    # -- 3. idempotence watermark: warm app vs never-seen app cold-start
    with timer() as t_seen:
        for _ in range(reps):
            w = txlog.latest_txn_version(table, "demo_stream")
    assert w == N_COMMITS - 1
    out["txn_seen_ms"] = round(t_seen[0] / reps * 1000, 2)
    with timer() as t_cold:
        for _ in range(reps):
            nothing = txlog.latest_txn_version(table, "never_seen_app")
    assert nothing is None
    out["txn_neverseen_ms"] = round(t_cold[0] / reps * 1000, 2)

    # -- 4. checkpoint resolution: pointer fast path vs listing fallback
    with timer() as t_ptr:
        for _ in range(200):
            v_ptr = txlog._latest_checkpoint_at_or_below(table, head)
    out["ckpt_resolve_us_pointer"] = round(t_ptr[0] / 200 * 1e6, 1)
    ptr = os.path.join(logdir, "_last_checkpoint")
    saved = open(ptr).read()
    os.unlink(ptr)
    try:
        with timer() as t_list:
            for _ in range(200):
                v_list = txlog._latest_checkpoint_at_or_below(table, head)
    finally:
        with open(ptr, "w") as f:
            f.write(saved)
    assert v_ptr == v_list
    out["ckpt_resolve_us_listing"] = round(t_list[0] / 200 * 1e6, 1)

    # -- 5. vacuum: checkpoint pruning at depth + retained reads exact
    kept_versions = 25
    txlog.vacuum_versioned(table, keep_versions=kept_versions, min_file_age_s=0.0)
    after = ckpt_versions()
    out["checkpoints_after_vacuum"] = len(after)
    out["checkpoint_versions_kept"] = after
    cutoff = head - kept_versions + 1
    n_at_cutoff = txlog.read_versioned(spark, table, version=cutoff).count()
    assert n_at_cutoff == (cutoff + 1) * ROWS_PER, n_at_cutoff
    n_head = txlog.read_versioned(spark, table).count()
    assert n_head == N_COMMITS * ROWS_PER, n_head
    out["retained_reads_exact"] = True

    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
