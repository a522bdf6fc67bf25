#!/usr/bin/env python
"""Round-12 static plan sweep: for every headline query, count physical
plan nodes (parquet scans, exchanges, windows, joins) and flag likely
duplicated-subtree shapes (guide §2.4) — scans far above the number of
distinct tables the query touches.  Plan-only; probe jobs that run at
construction time do execute, but nothing is timed.

Usage: python scripts/r12_plan_sweep.py [q_a q_b ...]
"""
from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from jibaro_spark.session import build_session

    spark = build_session(app_name="r12_plan_sweep")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from bench import HEADLINE
    from jibaro_spark.queries import REGISTRY

    names = sys.argv[1:] or HEADLINE
    rows = []
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}", flush=True)
            continue
        scans = len(re.findall(r"Scan parquet", txt))
        tables = len(set(re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", txt))) or len(
            set(re.findall(r"file:[^\n]*/(\w+)\.parquet", txt))
        )
        row = {
            "q": name,
            "scans": scans,
            "tables": tables,
            "exch": len(re.findall(r"Exchange", txt)),
            "reuse": len(re.findall(r"ReusedExchange", txt)),
            "win": len(re.findall(r"\bWindow\b", txt)),
            "smj": len(re.findall(r"SortMergeJoin", txt)),
            "bhj": len(re.findall(r"BroadcastHashJoin", txt)),
            "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", txt)),
            "cart": len(re.findall(r"CartesianProduct", txt)),
            "pyeval": len(re.findall(r"(BatchEvalPython|ArrowEvalPython)", txt)),
        }
        rows.append(row)
        print(json.dumps(row, separators=(",", ":")), flush=True)
    # summary: worst scan amplification
    rows.sort(key=lambda r: -(r["scans"] - r["tables"]))
    print("== top scan amplification ==", flush=True)
    for r in rows[:15]:
        print(f"{r['scans']:3d} scans / {r['tables']} tables  exch={r['exch']} "
              f"win={r['win']}  {r['q']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
