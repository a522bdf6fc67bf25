"""Crash/fault-injection sweep for the txlog transactional plane
(seventh fuzz class, VERDICT r11 #1).

``jibaro_spark.txlog`` claims snapshot-isolated commits, checkpointed
replay, exactly-once ``foreachBatch`` via txn watermarks, and
crash-safety ("a crash before the log rename leaves orphan data files
but an UNCHANGED table") — and the whole CDC/maintenance surface
routes through it — but until this class every test exercised the
happy path.  This harness injects the faults the way Delta's own
tests do and asserts, for each scenario, either CLEAN RECOVERY or
LOUD REFUSAL — never silent duplicates, never lost commits, never
silently-wrong reads:

* **F1 writer dies between data-file move and log commit**
  (in-process: the commit-time ``os.link`` raises; txlog has no
  try/finally between the file moves and the link, so the
  filesystem state is byte-identical to SIGKILL at that instant).
* **F2 same kill point, REAL SIGKILL** — a subprocess writer calls
  ``os.kill(getpid(), SIGKILL)`` inside the commit link; the parent
  asserts the table is unchanged and recovers it.
* **F3 duplicate micro-batch replay** — a restarted ``foreachBatch``
  re-delivers already-committed batches (including across a
  checkpoint boundary); the txn watermark must skip them.
* **F4 concurrent committers racing the same version** — N threads
  append at once (optimistic-concurrency retry), plus two racers
  carrying the SAME txn batch (exactly one may land).
* **F5 torn/truncated ``_last_checkpoint`` pointer** (and a pointer
  at a nonexistent version) — reads fall back to the listing; the
  next checkpoint repairs the pointer.
* **F6 writer dies mid-checkpoint** (between the tmp write and the
  atomic link) — no torn checkpoint is ever visible; vacuum reclaims
  the tmp.
* **F7 vacuum racing a pinned reader** — a snapshot inside the
  retention window is untouched; an out-of-retention time travel
  fails LOUDLY at scan (metadata resolves, data files are gone),
  never returns partial rows.
* **F8 CDC merge crash + rerun** — ``cdc_merge_table`` through the
  txlog lane: a crashed merge leaves the curated table unchanged;
  the rerun converges to the exact expected state with one MERGE in
  history.

Reference contract being emulated: ``/root/reference/jibaro/datalake/
cdc.py:203-269`` (Delta MERGE + history under Structured Streaming's
exactly-once).  Import-safe (no SparkSession at import) so the pytest
guards in ``tests/test_fault_injection.py`` run the in-process
scenarios directly; ``python scripts/fault_inject.py`` runs all of
them (including the SIGKILL subprocess) and prints one JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


class _Boom(RuntimeError):
    """Stand-in for process death at an injected kill point."""


def _rows(spark, table, version=None):
    from jibaro_spark import txlog

    return sorted(
        tuple(r) for r in txlog.read_versioned(spark, table, version).collect()
    )


def _mkdf(spark, pairs):
    return spark.createDataFrame(pairs, "id long, v string")


def _orphans(table):
    """Data files in the table root not referenced by the head snapshot."""
    from jibaro_spark import txlog

    live = set()
    if txlog.latest_version(table) is not None:
        live = {os.path.basename(p) for p in txlog.snapshot_files(table)}
    return [
        f
        for f in os.listdir(table)
        if f.endswith(".parquet") and f not in live
    ]


def _patched_link(match_dir, exc=None, on_hit=None):
    """A replacement for ``os.link`` that fires exactly when txlog
    commits a file into ``match_dir`` (the injected kill point: after
    every data file has been moved into the table root, before the
    commit becomes visible).  Returns (wrapper, restore)."""
    real = os.link

    def wrapper(src, dst, *a, **kw):
        if os.path.dirname(os.path.abspath(dst)) == os.path.abspath(match_dir):
            if on_hit is not None:
                on_hit()
            raise exc or _Boom(f"injected crash before commit of {dst}")
        return real(src, dst, *a, **kw)

    def restore():
        os.link = real

    os.link = wrapper
    return wrapper, restore


# ---------------------------------------------------------------- F1
def scenario_crash_before_commit(spark, root):
    """Kill point: every data file moved into the table root, log
    commit not yet visible.  txlog executes no cleanup between those
    two steps, so raising at the link call leaves the exact filesystem
    a SIGKILL would.  Contract: table UNCHANGED, orphans reclaimable,
    next writer unaffected."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f1")
    txlog.write_versioned(_mkdf(spark, [(1, "a"), (2, "b")]), t)
    before = _rows(spark, t)
    _, restore = _patched_link(os.path.join(t, txlog.LOG_DIR))
    try:
        try:
            txlog.write_versioned(_mkdf(spark, [(3, "c")]), t)
            checks.append(("f1_injection_fired", False, "no crash raised"))
        except _Boom:
            pass
    finally:
        restore()
    checks.append(("f1_head_unchanged", txlog.latest_version(t) == 0, ""))
    checks.append(("f1_rows_unchanged", _rows(spark, t) == before, ""))
    orph = _orphans(t)
    checks.append(("f1_orphans_present", len(orph) >= 1, f"orphans={orph}"))
    # tmp commit file was never created (crash at link, before tmp
    # unlink) — actually the tmp EXISTS (written before link); vacuum
    # must reclaim both it and the orphan data files.
    deleted = txlog.vacuum_versioned(t, keep_versions=5, min_file_age_s=0.0)
    checks.append(("f1_vacuum_reclaims", deleted >= 1 and not _orphans(t), ""))
    v = txlog.write_versioned(_mkdf(spark, [(4, "d")]), t)
    checks.append(("f1_recovery_commit", v == 1, f"v={v}"))
    checks.append(
        ("f1_recovery_rows", _rows(spark, t) == before + [(4, "d")], "")
    )
    return checks


# ---------------------------------------------------------------- F2
_F2_CHILD = r"""
import os, signal, sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from jibaro_spark import txlog

spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
t = {table!r}
real = os.link
def dying_link(src, dst, *a, **kw):
    if os.path.dirname(os.path.abspath(dst)) == os.path.abspath(
        os.path.join(t, txlog.LOG_DIR)
    ):
        os.kill(os.getpid(), signal.SIGKILL)  # die mid-commit, no cleanup
    return real(src, dst, *a, **kw)
os.link = dying_link
df = spark.createDataFrame([(99, "dead")], "id long, v string")
txlog.write_versioned(df, t)
print("UNREACHABLE")
"""


def scenario_sigkill_before_commit(spark, root):
    """F1's kill point with a REAL SIGKILL in a subprocess writer —
    the full-fidelity crash (no exception unwinding, no atexit)."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f2")
    txlog.write_versioned(_mkdf(spark, [(1, "a")]), t)
    before = _rows(spark, t)
    script = _F2_CHILD.format(repo=REPO, table=t)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    checks.append(
        (
            "f2_child_sigkilled",
            proc.returncode == -9 and "UNREACHABLE" not in proc.stdout,
            f"rc={proc.returncode}",
        )
    )
    checks.append(("f2_head_unchanged", txlog.latest_version(t) == 0, ""))
    checks.append(("f2_rows_unchanged", _rows(spark, t) == before, ""))
    checks.append(("f2_orphans_present", len(_orphans(t)) >= 1, ""))
    txlog.vacuum_versioned(t, keep_versions=5, min_file_age_s=0.0)
    checks.append(("f2_vacuum_reclaims", not _orphans(t), ""))
    v = txlog.write_versioned(_mkdf(spark, [(2, "b")]), t)
    checks.append(
        (
            "f2_recovery",
            v == 1 and _rows(spark, t) == before + [(2, "b")],
            "",
        )
    )
    return checks


# ---------------------------------------------------------------- F3
def scenario_duplicate_batch_replay(spark, root):
    """A restarted stream re-delivers micro-batches at or below the
    committed txn watermark — including batches that predate the
    consolidated checkpoint (the watermark must survive checkpoint
    consolidation, txlog's ``txns`` action).  Contract: zero new rows,
    zero new versions, replay orphans reclaimable."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f3")
    # 12 micro-batches: crosses CHECKPOINT_INTERVAL=10, so batches
    # 0..10's commits sit below a checkpoint when we replay them
    for b in range(12):
        txlog.write_versioned(
            _mkdf(spark, [(b, f"batch{b}")]),
            t,
            txn_app="stream1",
            txn_version=b,
        )
    head = txlog.latest_version(t)
    rows = _rows(spark, t)
    checks.append(
        (
            "f3_checkpoint_exists",
            os.path.exists(txlog._checkpoint_file(t, 10)),
            "",
        )
    )
    # replay: last batch, a mid-stream batch, and a pre-checkpoint
    # batch — each with DIFFERENT (poisoned) data; a non-skipped
    # replay would visibly corrupt the table
    for b in (11, 5, 0):
        v = txlog.write_versioned(
            _mkdf(spark, [(1000 + b, "POISON")]),
            t,
            txn_app="stream1",
            txn_version=b,
        )
        checks.append((f"f3_replay_b{b}_skipped", v == head, f"v={v}"))
    checks.append(("f3_head_unchanged", txlog.latest_version(t) == head, ""))
    checks.append(("f3_rows_unchanged", _rows(spark, t) == rows, ""))
    checks.append(
        ("f3_watermark", txlog.latest_txn_version(t, "stream1") == 11, "")
    )
    txlog.vacuum_versioned(t, keep_versions=100, min_file_age_s=0.0)
    checks.append(("f3_replay_orphans_reclaimed", not _orphans(t), ""))
    # a DIFFERENT app is not gated by stream1's watermark
    v = txlog.write_versioned(
        _mkdf(spark, [(50, "other")]), t, txn_app="stream2", txn_version=0
    )
    checks.append(("f3_other_app_commits", v == head + 1, f"v={v}"))
    return checks


# ---------------------------------------------------------------- F4
def scenario_concurrent_committers(spark, root):
    """N threads race the same head version; optimistic concurrency
    must serialize them — contiguous versions, every payload exactly
    once.  Then two racers carry the SAME txn batch: exactly one may
    land (the foreachBatch zombie-executor double-delivery shape)."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f4")
    txlog.write_versioned(_mkdf(spark, [(0, "seed")]), t)
    n = 8
    dfs = [_mkdf(spark, [(100 + i, f"w{i}")]) for i in range(n)]
    errs = []
    barrier = threading.Barrier(n)

    def commit(i):
        try:
            barrier.wait()
            txlog.write_versioned(dfs[i], t, max_retries=50)
        except Exception as ex:  # noqa: BLE001
            errs.append((i, repr(ex)))

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    checks.append(("f4_no_commit_errors", not errs, f"errs={errs}"))
    checks.append(
        ("f4_versions_contiguous", txlog.latest_version(t) == n, "")
    )
    want = sorted([(0, "seed")] + [(100 + i, f"w{i}") for i in range(n)])
    checks.append(("f4_all_rows_exactly_once", _rows(spark, t) == want, ""))
    checks.append(("f4_history_complete", len(txlog.history(t)) == n + 1, ""))
    # same-txn race: two writers deliver the SAME micro-batch
    errs2 = []
    barrier2 = threading.Barrier(2)
    dup = [_mkdf(spark, [(500, "dupA")]), _mkdf(spark, [(500, "dupB")])]

    def commit_txn(i):
        try:
            barrier2.wait()
            txlog.write_versioned(
                dup[i], t, txn_app="s", txn_version=7, max_retries=50
            )
        except Exception as ex:  # noqa: BLE001
            errs2.append((i, repr(ex)))

    ths = [threading.Thread(target=commit_txn, args=(i,)) for i in range(2)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    rows = _rows(spark, t)
    n_dup = sum(1 for r in rows if r[0] == 500)
    checks.append(("f4_txn_race_no_errors", not errs2, f"errs={errs2}"))
    checks.append(("f4_txn_race_exactly_once", n_dup == 1, f"n={n_dup}"))
    return checks


# ---------------------------------------------------------------- F5
def scenario_torn_pointer(spark, root):
    """A torn/truncated ``_last_checkpoint`` (and one naming a
    nonexistent checkpoint) must degrade to the directory listing —
    same answers, never a crash — and the next checkpoint repairs it."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f5")
    for b in range(13):
        txlog.write_versioned(_mkdf(spark, [(b, f"r{b}")]), t)
    rows = _rows(spark, t)
    head = txlog.latest_version(t)
    ptr = txlog._last_checkpoint_pointer(t)
    good = open(ptr).read()
    # torn mid-write (truncated JSON)
    with open(ptr, "w") as f:
        f.write(good[: max(1, len(good) // 2 - 1)])
    checks.append(("f5_torn_head", txlog.latest_version(t) == head, ""))
    checks.append(("f5_torn_rows", _rows(spark, t) == rows, ""))
    # pointer at a version with no checkpoint file
    with open(ptr, "w") as f:
        json.dump({"version": 9999}, f)
    checks.append(("f5_dangling_head", txlog.latest_version(t) == head, ""))
    checks.append(("f5_dangling_rows", _rows(spark, t) == rows, ""))
    # empty pointer
    open(ptr, "w").close()
    checks.append(("f5_empty_rows", _rows(spark, t) == rows, ""))
    # next checkpoint repairs the pointer
    txlog.write_checkpoint(t)
    try:
        with open(ptr) as f:
            v = int(json.load(f)["version"])
        repaired = v == head and os.path.exists(txlog._checkpoint_file(t, v))
    except Exception:  # noqa: BLE001
        repaired = False
    checks.append(("f5_pointer_repaired", repaired, ""))
    return checks


# ---------------------------------------------------------------- F6
def scenario_crash_mid_checkpoint(spark, root):
    """Writer dies between the checkpoint tmp write and its atomic
    link: no torn checkpoint may ever be visible (readers would parse
    a half-written live-file set).  Contract: no ``*.checkpoint.json``
    appears, reads replay from the commits, vacuum reclaims the tmp,
    and a later checkpoint succeeds."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f6")
    # 9 commits: below the auto-checkpoint cadence, so the only
    # checkpoint attempt is ours
    for b in range(9):
        txlog.write_versioned(_mkdf(spark, [(b, f"r{b}")]), t)
    rows = _rows(spark, t)
    log_dir = os.path.join(t, txlog.LOG_DIR)
    _, restore = _patched_link(log_dir)
    try:
        try:
            txlog.write_checkpoint(t)
            checks.append(("f6_injection_fired", False, "no crash raised"))
        except _Boom:
            pass
    finally:
        restore()
    ckpts = [f for f in os.listdir(log_dir) if f.endswith(".checkpoint.json")]
    checks.append(("f6_no_torn_checkpoint", not ckpts, f"ckpts={ckpts}"))
    tmps = [f for f in os.listdir(log_dir) if f.startswith("_tmp_")]
    checks.append(("f6_tmp_left", len(tmps) >= 1, ""))
    checks.append(("f6_reads_ok", _rows(spark, t) == rows, ""))
    txlog.vacuum_versioned(t, keep_versions=100, min_file_age_s=0.0)
    tmps = [f for f in os.listdir(log_dir) if f.startswith("_tmp_")]
    checks.append(("f6_tmp_reclaimed", not tmps, f"tmps={tmps}"))
    v = txlog.write_checkpoint(t)
    checks.append(
        (
            "f6_checkpoint_recovers",
            os.path.exists(txlog._checkpoint_file(t, v)),
            "",
        )
    )
    checks.append(("f6_post_ckpt_reads", _rows(spark, t) == rows, ""))
    return checks


# ---------------------------------------------------------------- F7
def scenario_vacuum_vs_pinned_reader(spark, root):
    """Vacuum must never touch a retained snapshot's files; an
    out-of-retention time travel must fail LOUDLY at scan (the Delta
    vacuum-horizon contract), never silently return the surviving
    subset of rows."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f7")
    # overwrite commits: each version's snapshot references ONLY its
    # own files, so out-of-retention versions' files age out (an
    # append-only table would keep every file live at head and give
    # vacuum nothing to reclaim)
    txlog.write_versioned(_mkdf(spark, [(0, "r0")]), t)
    for b in range(1, 12):
        txlog.write_versioned(
            _mkdf(spark, [(b, f"r{b}")]), t, mode="overwrite"
        )
    head = txlog.latest_version(t)
    pinned = head - 2  # inside keep_versions=5
    pinned_rows = _rows(spark, t, pinned)
    pinned_files = txlog.snapshot_files(t, pinned)
    old_rows = _rows(spark, t, 0)
    txlog.vacuum_versioned(t, keep_versions=5, min_file_age_s=0.0)
    checks.append(
        (
            "f7_pinned_files_intact",
            all(os.path.exists(p) for p in pinned_files),
            "",
        )
    )
    checks.append(("f7_pinned_rows_stable", _rows(spark, t, pinned) == pinned_rows, ""))
    # out-of-retention: metadata resolves, scan must refuse loudly
    loud = False
    try:
        got = _rows(spark, t, 0)
        loud = False
        detail = f"silently returned {len(got)} rows (expected refusal)"
    except Exception as ex:  # noqa: BLE001
        loud = True
        detail = type(ex).__name__
    # guard against vacuous pass: version 0's files must actually be gone
    gone = not all(
        os.path.exists(p) for p in txlog.snapshot_files(t, 0)
    )
    checks.append(("f7_old_files_reclaimed", gone, ""))
    checks.append(("f7_out_of_retention_loud", loud, detail))
    checks.append(("f7_old_rows_were_real", len(old_rows) > 0, ""))
    return checks


# ---------------------------------------------------------------- F8
def scenario_cdc_merge_crash_rerun(spark, root):
    """End-to-end through ``cdc_merge_table``'s txlog lane: a merge
    that dies at the commit point leaves the curated table unchanged;
    the rerun converges to the exact expected post-merge state."""
    from jibaro_spark import txlog
    from jibaro_spark.catalog import Catalog, TableRef
    from jibaro_spark.config import Settings
    from jibaro_spark.operators.cdc import cdc_apply, cdc_merge_table

    checks = []
    base = os.path.join(root, "f8lake")
    cat = Catalog(Settings(base_path=base, use_txlog=True))
    ref = TableRef("curated", "proj", "db", "users")
    path = cat.path(ref)
    # seed via txlog directly (an INITIAL_LOAD-shaped table)
    txlog.write_versioned(
        spark.createDataFrame(
            [(1, "ana"), (2, "bob")], "id long, name string"
        ),
        path,
        operation="INITIAL_LOAD",
    )
    env = _envelope(
        spark,
        [
            (1, "ana2", "u", 10),  # update
            (2, None, "d", 11),  # delete
            (3, "cei", "c", 12),  # insert
        ],
    )
    current = txlog.read_versioned(spark, path)
    expected = sorted(
        tuple(r)
        for r in cdc_apply(current, env, ["id"], ["timestamp"]).collect()
    )
    before = _rows_generic(spark, path)
    _, restore = _patched_link(os.path.join(path, txlog.LOG_DIR))
    try:
        try:
            cdc_merge_table(spark, cat, env, ref, ["id"], ["timestamp"])
            checks.append(("f8_injection_fired", False, "no crash raised"))
        except _Boom:
            pass
    finally:
        restore()
    checks.append(("f8_table_unchanged", _rows_generic(spark, path) == before, ""))
    checks.append(("f8_head_unchanged", txlog.latest_version(path) == 0, ""))
    metrics = cdc_merge_table(spark, cat, env, ref, ["id"], ["timestamp"])
    checks.append(("f8_rerun_is_merge", metrics["operation"] == "MERGE", ""))
    after = sorted(
        tuple(r) for r in txlog.read_versioned(spark, path).collect()
    )
    checks.append(("f8_rerun_converges", after == expected, f"{after} vs {expected}"))
    merges = [h for h in txlog.history(path) if h["operation"] == "MERGE"]
    checks.append(("f8_single_merge_in_history", len(merges) == 1, ""))
    # keep_versions=1: v0's files are legitimately retained for time
    # travel under a wider window and would read as "orphans" to the
    # head-only _orphans helper — with retention collapsed to the head,
    # everything unreferenced (v0's files AND the crashed merge's
    # moved-but-never-committed files) must be reclaimed
    txlog.vacuum_versioned(path, keep_versions=1, min_file_age_s=0.0)
    checks.append(("f8_crash_orphans_reclaimed", not _orphans(path), ""))
    return checks


def _rows_generic(spark, table):
    from jibaro_spark import txlog

    return sorted(
        tuple(r) for r in txlog.read_versioned(spark, table).collect()
    )


def _envelope(spark, rows):
    """Debezium-shaped envelope the CDC operators consume:
    key(id), value(op, before, after(id, name)), top-level timestamp."""
    from pyspark.sql import functions as F

    flat = spark.createDataFrame(
        rows, "id long, name string, op string, ts long"
    )
    return flat.select(
        F.struct("id").alias("key"),
        F.struct(
            F.col("op"),
            F.lit(None).cast("struct<id:bigint,name:string>").alias("before"),
            F.struct("id", "name").alias("after"),
        ).alias("value"),
        F.col("ts").alias("timestamp"),
    )


# ---------------------------------------------------------------- F9
def scenario_compaction_crash(spark, root):
    """OPTIMIZE dies at its commit point: the pre-compaction snapshot
    must stay the head (same files, same rows), and a rerun compacts
    cleanly with the crash's rewritten files left as vacuumable
    orphans."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f9")
    for b in range(6):
        txlog.write_versioned(_mkdf(spark, [(b, f"r{b}")]), t)
    head = txlog.latest_version(t)
    rows = _rows(spark, t)
    n_files = len(txlog.snapshot_files(t))
    _, restore = _patched_link(os.path.join(t, txlog.LOG_DIR))
    try:
        try:
            txlog.compact_versioned(spark, t, target_file_bytes=1 << 30)
            checks.append(("f9_injection_fired", False, "no crash raised"))
        except _Boom:
            pass
    finally:
        restore()
    checks.append(("f9_head_unchanged", txlog.latest_version(t) == head, ""))
    checks.append(("f9_rows_unchanged", _rows(spark, t) == rows, ""))
    checks.append(
        ("f9_files_unchanged", len(txlog.snapshot_files(t)) == n_files, "")
    )
    checks.append(("f9_orphans_present", len(_orphans(t)) >= 1, ""))
    v = txlog.compact_versioned(spark, t, target_file_bytes=1 << 30)
    checks.append(
        (
            "f9_rerun_compacts",
            v == head + 1
            and _rows(spark, t) == rows
            and len(txlog.snapshot_files(t)) == 1,
            f"v={v} files={len(txlog.snapshot_files(t))}",
        )
    )
    txlog.vacuum_versioned(t, keep_versions=1, min_file_age_s=0.0)
    checks.append(("f9_orphans_reclaimed", not _orphans(t), ""))
    return checks


# --------------------------------------------------------------- F10
def scenario_replace_conflict(spark, root):
    """Two targeted rewrites (mode='replace') of the SAME file: the
    second must refuse LOUDLY (its target left the snapshot), never
    double-remove or silently drop rows."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f10")
    txlog.write_versioned(_mkdf(spark, [(1, "a")]), t)
    txlog.write_versioned(_mkdf(spark, [(2, "b")]), t)
    victim = txlog.snapshot_files(t)[0]
    v = txlog.write_versioned(
        _mkdf(spark, [(1, "a2")]), t, mode="replace", replace_paths=[victim]
    )
    checks.append(("f10_first_replace_ok", v == 2, f"v={v}"))
    rows = _rows(spark, t)
    loud, detail = False, ""
    try:
        txlog.write_versioned(
            _mkdf(spark, [(9, "ghost")]),
            t,
            mode="replace",
            replace_paths=[victim],
        )
        detail = "second replace of a removed file committed silently"
    except ValueError as ex:
        loud, detail = True, type(ex).__name__
    checks.append(("f10_conflict_loud", loud, detail))
    checks.append(("f10_rows_intact", _rows(spark, t) == rows, ""))
    checks.append(("f10_head_intact", txlog.latest_version(t) == v, ""))
    return checks


# --------------------------------------------------------------- F11
def scenario_vacuum_age_guard(spark, root):
    """Vacuum racing an IN-FLIGHT writer: the writer's just-moved,
    not-yet-committed data files are young orphans — the
    ``min_file_age_s`` guard must keep them so the imminent commit
    stays valid; only with the guard at 0 (caller asserts no writers)
    may they be reclaimed."""
    from jibaro_spark import txlog

    checks = []
    t = os.path.join(root, "f11")
    txlog.write_versioned(_mkdf(spark, [(1, "a")]), t)
    # freeze a writer at the commit point: data files moved, no log
    _, restore = _patched_link(os.path.join(t, txlog.LOG_DIR))
    try:
        try:
            txlog.write_versioned(_mkdf(spark, [(2, "b")]), t)
        except _Boom:
            pass
    finally:
        restore()
    orph = _orphans(t)
    checks.append(("f11_inflight_files_present", len(orph) >= 1, ""))
    # a concurrent vacuum with the production age guard must NOT
    # reclaim the in-flight writer's young files
    txlog.vacuum_versioned(t, keep_versions=5, min_file_age_s=3600.0)
    checks.append(
        (
            "f11_age_guard_protects",
            sorted(_orphans(t)) == sorted(orph),
            f"{_orphans(t)} vs {orph}",
        )
    )
    # guard off (no-writers assertion) reclaims them
    txlog.vacuum_versioned(t, keep_versions=5, min_file_age_s=0.0)
    checks.append(("f11_guard_off_reclaims", not _orphans(t), ""))
    return checks


IN_PROCESS_SCENARIOS = [
    scenario_crash_before_commit,
    scenario_duplicate_batch_replay,
    scenario_concurrent_committers,
    scenario_torn_pointer,
    scenario_crash_mid_checkpoint,
    scenario_vacuum_vs_pinned_reader,
    scenario_cdc_merge_crash_rerun,
    scenario_compaction_crash,
    scenario_replace_conflict,
    scenario_vacuum_age_guard,
]
ALL_SCENARIOS = IN_PROCESS_SCENARIOS + [scenario_sigkill_before_commit]


def run(spark, scenarios=None, root=None):
    results = []
    own_root = root is None
    root = root or tempfile.mkdtemp(prefix="fault_inject_")
    try:
        for fn in scenarios or ALL_SCENARIOS:
            try:
                results.extend(fn(spark, root))
            except Exception as ex:  # noqa: BLE001
                results.append((f"{fn.__name__}_crashed", False, repr(ex)))
    finally:
        if own_root:
            shutil.rmtree(root, ignore_errors=True)
    return results


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fault_inject")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = run(spark)
    failed = [(n, d) for n, ok, d in results if not ok]
    for n, ok, d in results:
        print(f"{'PASS' if ok else 'FAIL'} {n} {d}".rstrip(), flush=True)
    print(
        json.dumps(
            {
                "class": "fault",
                "checks": len(results),
                "failed": [n for n, _ in failed],
            }
        ),
        flush=True,
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
