"""Multimodal declared queries ([ext]) — binary content columns over
the documents fixture (text bytes stand in for media payloads; the
plumbing — binary columns, metadata structs, Arrow-batched
mapInPandas — is identical for real media).

The mapInPandas decode is oracle-checked end to end: the injected
"decoder" derives its outputs from byte length, so DuckDB can verify
the whole Arrow round-trip row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.operators import multimodal as mm
from jibaro_spark.queries.registry import declare, load_tables


#: container magic bytes per rotating kind — so the magic-byte sniffer
#: has real positives to detect (PNG 8B, MP4 ftyp 8B, ID3 3B)
_MAGIC_PNG = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])
_MAGIC_MP4 = bytes([0x00, 0x00, 0x00, 0x20]) + b"ftyp"
_MAGIC_ID3 = b"ID3"


def _with_content(docs: DataFrame) -> DataFrame:
    """documents.text → opaque binary content (with the container's
    magic header prepended) + media metadata (kind rotates
    image/audio/video deterministically by doc_id)."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
    )
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(_MAGIC_MP4))
        .when(F.col("doc_id") % 3 == 1, F.lit(_MAGIC_PNG))
        .otherwise(F.lit(_MAGIC_ID3))
    )
    # the synthetic content derives from BOTH doc_id (magic/kind) and
    # text (payload) — docs missing either have no content on either
    # side (NULL-fuzz sweep; every oracle carries the matching WHERE)
    docs = docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    return docs.select(
        "doc_id",
        F.concat(magic, F.encode("text", "UTF-8")).alias("content"),
        mm.media_struct(
            kind,
            F.lit("application/octet-stream"),
            duration_ms=(F.col("n_chars") * 40).cast("bigint"),
        ).alias("media"),
    )


QMM_STATS_ORACLE = """
WITH c AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 3 = 0 THEN '\\x00\\x00\\x00\\x20ftyp'::BLOB
               WHEN doc_id % 3 = 1 THEN '\\x89PNG\\x0D\\x0A\\x1A\\x0A'::BLOB
               ELSE 'ID3'::BLOB END) || encode(text) AS content
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
)
SELECT doc_id,
       octet_length(content) AS n_bytes,
       sha256(hex(content)) AS sha256_hex,
       CASE WHEN doc_id % 3 = 0 THEN 'video/mp4'
            WHEN doc_id % 3 = 1 THEN 'image/png'
            ELSE 'audio/mp3' END AS sniffed_mime
FROM c
ORDER BY doc_id
"""


@declare(
    "q_multimodal_stats",
    oracle=QMM_STATS_ORACLE,
    description="codec-free binary stats: size, sha256, magic sniff (multimodal [ext])",
)
def q_multimodal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # DuckDB's sha256 is VARCHAR-only, so the ORACLE column hashes the
    # hex encoding (uppercase in both engines); the operator's raw
    # binary sha256 stays and is covered by the unit tests.
    return (
        mm.content_stats(_with_content(docs))
        .select(
            "doc_id",
            "n_bytes",
            F.sha2(F.hex(F.col("content")), 256).alias("sha256_hex"),
            "sniffed_mime",
        )
        .orderBy("doc_id")
    )


def _len_decoder(payload: bytes, media: dict) -> dict:
    """SQL-expressible deterministic 'decoder' (see module docstring)."""
    n = len(payload)
    return {
        "dec_width": n % 64 + 1,
        "dec_height": (n // 64) % 64 + 1,
        "dec_mean_luma": (n * 2654435761 % 1000) / 1000.0,
        "dec_channels": 3,
    }


QMM_DECODE_ORACLE = """
WITH c AS (
  SELECT doc_id,
         octet_length(encode(text))
           + CASE WHEN doc_id % 3 = 2 THEN 3 ELSE 8 END AS n
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
)
SELECT doc_id,
       n % 64 + 1 AS dec_width,
       (n // 64) % 64 + 1 AS dec_height,
       CAST((n * 2654435761 % 1000) AS DOUBLE) / 1000.0 AS dec_mean_luma,
       3 AS dec_channels
FROM c
ORDER BY doc_id
"""


@declare(
    "q_multimodal_decode",
    oracle=QMM_DECODE_ORACLE,
    description="Arrow-batched mapInPandas media decode plumbing, oracle-verified (multimodal [ext], U5)",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        mm.decode_media(_with_content(docs), decoder=_len_decoder)
        .select("doc_id", "dec_width", "dec_height", "dec_mean_luma", "dec_channels")
        .orderBy("doc_id")
    )


QMM_FRAMES_ORACLE = """
WITH plan AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 AND n_chars > 0
              THEN range(0, CAST(n_chars AS BIGINT) * 40, 1000)
              ELSE [] END AS frame_ts_ms
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
)
SELECT doc_id,
       len(frame_ts_ms) AS n_frames,
       frame_ts_ms[1] AS first_frame_ms,
       frame_ts_ms[-1] AS last_frame_ms
FROM plan
ORDER BY doc_id
"""


@declare(
    "q_frame_sample_plan",
    oracle=QMM_FRAMES_ORACLE,
    description="video frame-sampling plan from metadata, native sequence (multimodal [ext])",
)
def q_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # Scalar projection (driver canonicalizer can't sort array cells);
    # the plan array itself is exercised in tests.
    fts = F.col("frame_ts_ms")
    return (
        mm.plan_frame_samples(_with_content(docs), every_ms=1000)
        .select(
            "doc_id",
            F.size(fts).cast("long").alias("n_frames"),
            F.get(fts, 0).alias("first_frame_ms"),
            F.get(fts, F.size(fts) - 1).alias("last_frame_ms"),
        )
        .orderBy("doc_id")
    )
