"""Round-6 declared queries.

Each query is a PySpark callable hash-checked by the driver against a
DuckDB oracle at sf0.01 (see :mod:`jibaro_spark.queries.registry`).
This module adds the VERDICT-r5 asks: the protobuf codec round trip
(the driver-visible twin of ``q_avro_roundtrip``), the verifiable
count-min-sketch mode, and the q-gram-blocked edit-distance join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Protobuf codec round trip, driver-checked (VERDICT r5 §Next-3): rows
# → proto3 payload (programmatic FileDescriptorProto, no protoc) →
# Confluent frame with message-index byte → native wire slice →
# Arrow decode → rows.  decode(encode(x)) == x makes the ORACLE the
# source rows themselves — any drift in varint framing, field
# numbering, or the message-index parse breaks the hash.  The Avro
# twin is q_avro_roundtrip (round5.py); this one additionally proves
# the per-worker runtime self-heal (proto_python.ensure_protobuf_runtime)
# works under the driver's own session, where $PYTHONPATH enablement
# cannot be assumed.  Fixture columns are non-null at every SF, so
# proto3's absent-scalar defaulting cannot alias a value.
QPROTO_RT_ORACLE = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
ORDER BY doc_id
"""


@declare(
    "q_proto_roundtrip",
    oracle=QPROTO_RT_ORACLE,
    description="Confluent protobuf encode→frame→slice→decode round trip over documents — jar-free codec chain hash-checked against the source rows (F5 [ext])",
)
def q_proto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from jibaro_spark.codecs.confluent import payload_of, schema_id_of, wire_encode
    from jibaro_spark.codecs.proto_python import (
        decode_protobuf_python,
        encode_protobuf_python,
    )

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    rec = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), nullable=False),
            T.StructField("lang", T.StringType(), nullable=True),
            T.StructField("n_chars", T.LongType(), nullable=True),
        ]
    )
    framed = encode_protobuf_python(
        docs.select(
            F.struct(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("lang"),
                F.col("n_chars").cast("long").alias("n_chars"),
            ).alias("v")
        ),
        "v",
        rec,
    ).select(wire_encode(F.col("payload"), 47, "protobuf").alias("value"))
    sliced = framed.select(
        schema_id_of("value").alias("sid"),
        payload_of("value", "protobuf").alias("payload"),
    )
    decoded = decode_protobuf_python(sliced, "payload", rec)
    return (
        decoded.filter(F.col("sid") == 47)
        .select("value.doc_id", "value.lang", "value.n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Edit-distance join in q-gram signature mode (VERDICT r5 §Next-4):
# NO blocking key — candidates come from the Ed-Join document-
# frequency-ordered prefix signature (operators/dedup.edit_distance_
# join, qgram=2), which is LOSSLESS by the prefix-filter theorem.
# The oracle is the brute-force all-pairs Levenshtein answer, so a
# driver hash match proves the signature path loses no true pair and
# invents none.  Customer names differ only in their digit block —
# plentiful ed≤1 pairs (19.5k at sf0.01), zero at ed=0 (names unique).
QEDQ_ORACLE = """
SELECT a.c_custkey AS lid, b.c_custkey AS rid,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY lid, rid
"""


@declare(
    "q_edit_distance_qgram",
    oracle=QEDQ_ORACLE,
    description="edit-distance self-join via df-ordered q-gram prefix signatures (Ed-Join) — keyless lossless blocking, hash-checked against brute force (J5 [ext])",
)
def q_edit_distance_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import edit_distance_join

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    a = cust.select(F.col("c_custkey").alias("lid"), F.col("c_name").alias("lname"))
    b = cust.select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("rname"))
    pairs = edit_distance_join(
        a, b, "lid", "rid", "lname", "rname", max_dist=1, qgram=2
    )
    return (
        pairs.filter(F.col("lid") < F.col("rid"))
        .select("lid", "rid", F.col("dist").cast("int").alias("dist"))
        .orderBy("lid", "rid")
    )


# ---------------------------------------------------------------------------
# Count-min sketch in verifiable md5 mode (VERDICT r5 §Next-6): with a
# deterministic cross-engine hash, CMS estimates are a pure function of
# the data — the oracle REPLAYS the sketch (cell counts per (row,col))
# and the d-way min lookup in SQL, so the driver hash-checks the whole
# sketch→merge-law→lookup pipeline, not just row counts.  The xxhash64
# production mode (q_cms_heavy_hitters) keeps its pytest error-bound
# checks; cell math here is conv(substr(md5(d|term),1,8),16,10) % width
# == DuckDB CAST('0x'||substr(md5(...),1,8) AS BIGINT) % width.
_CMS_TOKS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
QCMS_MD5_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_CMS_TOKS}) AS term FROM documents
), ds AS (
  SELECT unnest([0, 1, 2, 3]) AS d
), sketch AS (
  SELECT d.d AS row,
         CAST(('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || term), 1, 8)) AS BIGINT) % 1024 AS col,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks, ds d
  GROUP BY 1, 2
), est AS (
  SELECT t.term, MIN(s.cnt) AS est
  FROM (SELECT DISTINCT term FROM toks) t
  CROSS JOIN ds d
  JOIN sketch s
    ON s.row = d.d
   AND s.col = CAST(('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || t.term), 1, 8)) AS BIGINT) % 1024
  GROUP BY t.term
)
SELECT term, CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, term LIMIT 25
"""


@declare(
    "q_cms_heavy_hitters_md5",
    oracle=QCMS_MD5_ORACLE,
    description="count-min heavy hitters, verifiable md5 hash mode — the SQL oracle replays sketch cells and d-way min lookup exactly (sketch family [ext])",
)
def q_cms_heavy_hitters_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sketches import cms_estimates
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    return (
        cms_estimates(terms, "term", depth=4, width=1024, hash_mode="md5")
        .select("term", F.col("est").cast("long").alias("est"))
        .orderBy(F.col("est").desc(), "term")
        .limit(25)
    )
