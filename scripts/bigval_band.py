"""Bigval memory-band machinery (import-safe — no SparkSession).

Extracted from ``null_fuzz_contract.py`` so the band's TEETH are
pytest-checkable (VERDICT r11 #7): the GC-retry that clears
allocation-churn false positives must NOT clear a kernel whose LIVE
set grows with value size.  ``tests/test_bigval_band_teeth.py`` runs
a linear kernel (in band) and a live-memory amplifier (out of band
even after ``System.gc()`` + re-measure) against this exact sampler
and band formula.

Measurement hygiene: run banded sweeps ALONE on the box.  A second
concurrent Spark JVM doesn't cross-count (each sampler sums only its
own descendants' RSS), but CPU contention defers GC and inflates
heap-used peaks — measured r12: three spurious ``mem_hog`` flags
(q_minhash_signature 2.2 GB, q_rolling_fingerprint 2.4 GB) during a
sweep that overlapped another local[8] session, all three back in
band standalone.
"""

from __future__ import annotations

import os
import time

#: peak <= MEM_BAND * max(base_peak, MEM_FLOOR_B) + MEM_PER_PAYLOAD_BYTE * payload
MEM_BAND = 4.0
MEM_FLOOR_B = 256 << 20
MEM_PER_PAYLOAD_BYTE = 128


def mem_limit(base_peak: "int | None", payload_bytes: int) -> float:
    return MEM_BAND * max(base_peak or 0, MEM_FLOOR_B) + (
        MEM_PER_PAYLOAD_BYTE * payload_bytes
    )


class PeakMemSampler:
    """Background sampler for the bigval memory band: every ~50 ms,
    JVM heap-used (via py4j — the giant shingle arrays live there)
    plus the summed RSS of every descendant process of this driver
    (the pyspark Arrow workers mapInPandas kernels run in).  Peak is
    reported as delta over the first sample, so the band measures
    per-query growth, not the JVM's accumulated floor.

    GC-retry re-measures MUST pass the first measurement's ``floor``
    back in: reused Python workers keep freed pages in RSS, so a
    fresh floor sampled after an amplifying first run is already
    elevated by roughly the amplifier's own peak — the retry delta
    then underestimates exactly the live growth the band exists to
    catch (found by ``tests/test_bigval_band_teeth.py``).  Pinning
    the original floor keeps the retry honest for the RSS term while
    the JVM-heap churn the retry exists to clear still genuinely
    re-measures post-``System.gc()``."""

    def __init__(self, jvm, floor: "int | None" = None):
        self._rt = jvm.java.lang.Runtime.getRuntime()
        self._jvm = jvm
        self._stop = False
        self._peak = 0
        self._floor = floor
        self._thread = None

    @staticmethod
    def _descendant_rss() -> int:
        me = os.getpid()
        children: "dict[int, list[int]]" = {}
        rss: "dict[int, int]" = {}
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            try:
                with open(f"/proc/{pid_s}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                ppid = int(parts[1])
                rss[int(pid_s)] = int(parts[21]) * os.sysconf("SC_PAGESIZE")
                children.setdefault(ppid, []).append(int(pid_s))
            except (OSError, IndexError, ValueError):
                continue
        total, stack, seen = 0, [me], {me}
        while stack:
            for c in children.get(stack.pop(), ()):
                if c not in seen:
                    seen.add(c)
                    stack.append(c)
                    total += rss.get(c, 0)
        return total

    def _sample(self) -> int:
        heap = int(self._rt.totalMemory() - self._rt.freeMemory())
        return heap + self._descendant_rss()

    def _run(self):
        while not self._stop:
            try:
                s = self._sample()
            except Exception:
                break
            if self._floor is None:
                self._floor = s
            self._peak = max(self._peak, s)
            time.sleep(0.05)

    def __enter__(self):
        import threading

        # collect the PREVIOUS queries' garbage before the floor sample:
        # mid-sweep, un-collected heap from earlier queries otherwise
        # lands in THIS query's delta (observed: a spurious 1.6 GB
        # "peak" on q_pmi_bigrams that vanishes standalone)
        try:
            self._jvm.java.lang.System.gc()
        except Exception:
            pass
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop = True
        self._thread.join(timeout=2.0)

    @property
    def floor(self) -> "int | None":
        """First sample (or the pinned floor a retry was given)."""
        return self._floor

    @property
    def peak_delta(self) -> int:
        if self._floor is None:
            return 0
        return max(0, self._peak - self._floor)
