"""3-hop CDC pipeline at ~sf1 streaming scale (VERDICT r7 stretch #8):
source_to_raw → raw_to_staged → staged_to_curated over ~6M
Debezium-style change events, with the curated-layer maintenance hooks
(compact → history → manifest → vacuum-if-due) firing — the
reference's core loop (`cdc.py:15-269`) at ~40× the pytest fixture
scale, timed per hop.

Events are generated DISTRIBUTEDLY (spark.range → native to_json +
binary concat wire framing; no driver-side rows): 1M keys, a 1M-row
snapshot + 4M updates in batch 1, then an incremental batch 2 of 800k
updates + 200k deletes.  Expected curated state: exactly 800k rows,
every one carrying its batch-2 value.

Usage: python scripts/pipeline_scale_demo.py [n_keys]   (default 1_000_000)
Prints one JSON line per hop plus a summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from jibaro_spark.catalog import Catalog, Layer, TableRef
from jibaro_spark.codecs.confluent import InMemorySchemaRegistry
from jibaro_spark.config import Settings
from jibaro_spark.maintenance import standard_post_hooks
from jibaro_spark.streaming import pipeline as pl

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
BASE = "/root/repo/.scratch/pipeline-demo"
SHARDS = 48

KEY_SCHEMA = "id BIGINT"
VALUE_SCHEMA = (
    "op STRING, "
    "before STRUCT<id BIGINT, name STRING, weight DOUBLE>, "
    "after STRUCT<id BIGINT, name STRING, weight DOUBLE>"
)

spark = (
    SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    .appName("pipeline_scale_demo")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

shutil.rmtree(BASE, ignore_errors=True)
lake = Catalog(Settings(protocol="file", base_path=BASE))
reg = InMemorySchemaRegistry()
KID = reg.register("products-key", KEY_SCHEMA)
VID = reg.register("products-value", VALUE_SCHEMA)

key_hdr = F.lit(b"\x00" + struct.pack(">I", KID))
val_hdr = F.lit(b"\x00" + struct.pack(">I", VID))


def frame_events(df):
    """(id, op, name, weight, offset) → Kafka-shaped wire rows, all
    native exprs: the Confluent header is a binary literal concat'd
    onto the JSON payload bytes."""
    after = F.when(
        F.col("op") != "d",
        F.struct(F.col("id"), F.col("name"), F.col("weight")),
    )
    before = F.when(
        F.col("op") == "d",
        F.struct(F.col("id"), F.col("name"), F.col("weight")),
    )
    env = F.struct(
        F.col("op").alias("op"), before.alias("before"), after.alias("after")
    )
    return df.select(
        F.concat(key_hdr, F.to_json(F.struct(F.col("id"))).cast("binary")).alias(
            "key"
        ),
        F.concat(val_hdr, F.to_json(env).cast("binary")).alias("value"),
        F.lit("dbserver1.inventory.products").alias("topic"),
        (F.col("id") % SHARDS).cast("int").alias("partition"),
        F.col("offset"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("offset")).alias(
            "timestamp"
        ),
        F.lit(0).cast("int").alias("timestampType"),
    )


def batch1():
    snap = spark.range(0, N_KEYS).select(
        F.col("id"),
        F.lit("r").alias("op"),
        F.concat(F.lit("n0-"), F.col("id")).alias("name"),
        (F.col("id") * 0.1).alias("weight"),
        F.col("id").alias("offset"),
    )
    upd = spark.range(N_KEYS, 5 * N_KEYS).select(
        (F.col("id") % N_KEYS).alias("id"),
        F.lit("u").alias("op"),
        F.concat(
            F.lit("n1-"), (F.col("id") / N_KEYS).cast("long"),
            F.lit("-"), F.col("id") % N_KEYS,
        ).alias("name"),
        ((F.col("id") % N_KEYS) * 0.2 + (F.col("id") / N_KEYS).cast("long")).alias(
            "weight"
        ),
        F.col("id").alias("offset"),
    )
    return frame_events(snap.unionByName(upd))


def batch2():
    upd = spark.range(0, 8 * N_KEYS // 10).select(
        F.col("id"),
        F.lit("u").alias("op"),
        F.concat(F.lit("n2-"), F.col("id")).alias("name"),
        (F.col("id") * 0.5).alias("weight"),
        (F.col("id") + 10 * N_KEYS).alias("offset"),
    )
    dels = spark.range(8 * N_KEYS // 10, N_KEYS).select(
        F.col("id"),
        F.lit("d").alias("op"),
        F.concat(F.lit("n2-"), F.col("id")).alias("name"),
        (F.col("id") * 0.5).alias("weight"),
        (F.col("id") + 11 * N_KEYS).alias("offset"),
    )
    return frame_events(upd.unionByName(dels))


def run_hops(tag):
    src_dir = BASE + "/source_topic"
    times = {}
    t0 = time.time()
    stream = spark.readStream.schema(
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp, timestampType int"
    ).parquet(src_dir)
    pl.source_to_raw(stream, lake, "lab", "inventory", "products")
    times["raw"] = round(time.time() - t0, 1)
    t0 = time.time()
    pl.raw_to_staged(spark, lake, "lab", "inventory", "products", reg, "json")
    times["staged"] = round(time.time() - t0, 1)
    t0 = time.time()
    pl.staged_to_curated(
        spark, lake, "lab", "inventory", "products",
        key_cols=["id"], post_hooks=standard_post_hooks(),
    )
    times["curated"] = round(time.time() - t0, 1)
    print(json.dumps({"hop_times_sec": times, "batch": tag}), flush=True)
    return times


overall = time.time()
t0 = time.time()
batch1().repartition(SHARDS).write.mode("append").parquet(BASE + "/source_topic")
gen1 = round(time.time() - t0, 1)
t1 = run_hops("batch1-5M")

t0 = time.time()
batch2().repartition(SHARDS // 4).write.mode("append").parquet(
    BASE + "/source_topic"
)
gen2 = round(time.time() - t0, 1)
t2 = run_hops("batch2-1M-incremental")

cur = spark.read.parquet(
    lake.path(TableRef(str(Layer.CURATED), "lab", "inventory", "products"))
)
n = cur.count()
n_b2 = cur.filter(F.col("name").startswith("n2-")).count()
hist = spark.read.parquet(
    lake.history_path(TableRef(str(Layer.CURATED), "lab", "inventory", "products"))
)
ok = n == 8 * N_KEYS // 10 and n_b2 == n
print(
    json.dumps(
        {
            "metric": "pipeline_3hop_sf1",
            "n_events": 6 * N_KEYS,
            "curated_rows": n,
            "curated_rows_expected": 8 * N_KEYS // 10,
            "all_rows_carry_batch2_values": n_b2 == n,
            "history_rows": hist.count(),
            "gen_sec": [gen1, gen2],
            "batch1_sec": t1,
            "batch2_sec": t2,
            "total_sec": round(time.time() - overall, 1),
            "ok": ok,
        }
    ),
    flush=True,
)
sys.exit(0 if ok else 1)
