"""10x scale smoke (VERDICT r5 §Next-5): run the heaviest headline
queries at sf0.1 and at the sharded ~sf1 synth fixture
(scripts/make_sf_synth.py) and report the time ratio.  The synth set
scales linearly by construction, so ratio >> R signals a super-linear
operator (candidate blowup, driver accumulation, partition cliff).

Usage: python scripts/scale_smoke.py [runs_per_point] [query ...]
(query names override the default heavy-headline list)
Prints one JSON line per query and a summary.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from jibaro_spark.queries import REGISTRY

SF01 = "/root/testdata/sf0.1"
# Point SPARK_GRAFT_SYNTH_DIR at a different replication (e.g. the
# 50-shard .scratch/sf5-synth) for a second scaling datapoint.
SF1 = os.environ.get("SPARK_GRAFT_SYNTH_DIR", "/root/repo/.scratch/sf1-synth")
REPL = int(os.environ.get("SPARK_GRAFT_SYNTH_REPL", "10"))
RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 1

QUERIES = [
    "q_bfs_hops",
    "q_embedding_dedup_clusters",
    "q_basket_pairs",
    "q_triangle_count",
    "q_percentile_prices",
    "q_salted_join",
    "q_crossdoc_shingle_dup",
    "q_rfm_segments",
    "q_minhash_near_dup",
    "q_pagerank_nations",
]
if len(sys.argv) > 2:
    QUERIES = sys.argv[2:]

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .appName("scale_smoke")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# warm the JVM/codegen once
REGISTRY["q_percentile_prices"].fn(spark, SF01).collect()

results = {}
for name in QUERIES:
    fn = REGISTRY[name].fn
    row = {}
    for label, sf in (("sf0.1", SF01), ("sf1", SF1)):
        best = None
        rows = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            rows = len(fn(spark, sf).collect())
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        row[label] = round(best, 2)
        row[f"rows_{label}"] = rows
    row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
    row["rows_ratio"] = round(row["rows_sf1"] / max(row["rows_sf0.1"], 1), 2)
    results[name] = row
    print(json.dumps({"query": name, **row}), flush=True)

tot01 = sum(r["sf0.1"] for r in results.values())
tot1 = sum(r["sf1"] for r in results.values())
print(json.dumps({
    "total_sf0.1": round(tot01, 2), "total_sf1": round(tot1, 2),
    "ratio": round(tot1 / tot01, 2), "replication": REPL,
}))
