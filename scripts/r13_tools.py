#!/usr/bin/env python
"""Round-13 optimization tooling (r12_tools with plans/r13 output): time and/or capture formatted plans
for a subset of declared queries.

Usage:
    python scripts/r12_tools.py time  q_a q_b ...   [--runs N]
    python scripts/r12_tools.py plan  q_a q_b ...   [--tag before|after]
    python scripts/r12_tools.py both  q_a q_b ...

Timing methodology matches bench.py exactly: noop sink, N runs
(default 2), report min.  Plans go to plans/r13/<name>_<tag>.txt.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    runs = 2
    tag = "before"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--tag":
            tag = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from jibaro_spark.session import build_session

    spark = build_session(app_name="r12_tools")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from jibaro_spark.queries import REGISTRY

    # same warmup as bench.py
    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        except Exception:
            pass

    plan_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        dq = REGISTRY[name]
        if mode in ("plan", "both"):
            df = dq.fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(plan_dir, f"{name}_{tag}.txt")
            with open(out, "w") as f:
                f.write(txt)
            print(f"plan -> {out}", flush=True)
        if mode in ("time", "both"):
            spark.sparkContext.setJobDescription(name)
            rs = []
            for _ in range(runs):
                t0 = time.perf_counter()
                dq.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                rs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            timings[name] = round(min(rs), 3)
            print(f"{name}: min={timings[name]} runs={[round(r,3) for r in rs]}",
                  flush=True)
    if timings:
        print(json.dumps({"timings": timings, "sf_dir": sf_dir}, separators=(",", ":")))


if __name__ == "__main__":
    main()
