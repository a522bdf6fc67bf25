#!/usr/bin/env python
"""Phase decomposition of q_minhash_dedup_clusters (r12 measurement).

Times, inside one warmed session: (a) collapse probe + reps, (b) sig
checkpoint job, (c) candidate pairs job, (d) connected components,
(e) the full query end-to-end.  Phases a-d re-run the real code paths
by calling the same operators with noop/count actions.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from jibaro_spark.session import build_session  # noqa: E402

spark = build_session(app_name="r12_decompose")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
from jibaro_spark.queries import REGISTRY  # noqa: E402
from jibaro_spark.queries.registry import load_tables  # noqa: E402
from jibaro_spark.operators.dedup import _exact_text_collapse, minhash_slots_md5  # noqa: E402
from jibaro_spark.operators.graph import connected_components  # noqa: E402
from jibaro_spark.operators.util import ensure_parallelism  # noqa: E402

for t in ("documents",):
    spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

# warm the full query once
REGISTRY["q_minhash_dedup_clusters"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

for rep in range(2):
    t0 = time.perf_counter()
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    reps, members = _exact_text_collapse(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text"
    )
    t1 = time.perf_counter()
    sig = ensure_parallelism(reps, by="doc_id").select(
        F.col("doc_id").alias("__id"),
        minhash_slots_md5(F.col("text"), num_hashes=16, shingle_n=3).alias("__slots"),
    ).localCheckpoint(eager=True)
    t2 = time.perf_counter()
    banded = sig.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda bnd: F.struct(
                    bnd.alias("band_idx"),
                    F.md5(F.concat_ws(",", F.slice("__slots", bnd * 4 + 1, 4))).alias(
                        "band_hash"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("__id", "bb.band_idx", "bb.band_hash")
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .distinct()
    )
    withsigs = cand.join(
        sig.select(F.col("__id").alias("id_a"), F.col("__slots").alias("sa")), "id_a"
    ).join(sig.select(F.col("__id").alias("id_b"), F.col("__slots").alias("sb")), "id_b")
    matches = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    pairs = (
        withsigs.withColumn("matches", matches)
        .where(F.col("matches") >= 8)
        .select("id_a", "id_b")
    )
    pairs.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    cc = connected_components(pairs, src="id_a", dst="id_b")
    cc.write.format("noop").mode("overwrite").save()
    t4 = time.perf_counter()
    REGISTRY["q_minhash_dedup_clusters"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t5 = time.perf_counter()
    print(
        f"rep{rep}: collapse+reps={t1-t0:.2f} sig_ckpt={t2-t1:.2f} "
        f"pairs_noop={t3-t2:.2f} cc={t4-t3:.2f} full_query={t5-t4:.2f}",
        flush=True,
    )
