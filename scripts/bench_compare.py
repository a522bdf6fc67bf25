"""Compare a fresh bench JSON (stdin or file) against a prior
BENCH_r*.json per-query: prints shared-query totals, the ratio, and
any query outside a band."""
import json
import sys

cur = json.load(open(sys.argv[1]))
old = json.load(open(sys.argv[2]))
band = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
qc, qo = cur["queries"], old["queries"]
shared = sorted(set(qc) & set(qo))
tc = sum(qc[q] for q in shared)
to = sum(qo[q] for q in shared)
print(f"shared={len(shared)} cur={tc:.2f}s old={to:.2f}s ratio={tc/to:.2f}")
for q in shared:
    r = qc[q] / qo[q] if qo[q] else float("inf")
    if r > band or r < 1 / band:
        print(f"  {q}: {qo[q]:.2f} -> {qc[q]:.2f}  ({r:.2f}x)")
