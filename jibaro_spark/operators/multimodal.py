"""Multimodal columns ([ext] — BASELINE mandate): images/audio/video as
opaque ``binary`` columns with a typed metadata struct, processed with
Arrow-batched ``mapInPandas`` — the 100 TB pattern for Python-side
media work (decode/resize/sample never belong in the JVM, and
per-row Python UDFs are 10-100× slower than Arrow batches).

Schema convention::

    content: binary                      -- raw media bytes
    media:   struct<kind string,         -- 'image' | 'audio' | 'video'
                    mime string,
                    width int, height int,
                    sample_rate int, duration_ms bigint>

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container —
``decode_media`` takes an injectable ``decoder``; the default STUB
raises ``NotImplementedError`` and :func:`fake_decoder` provides a
deterministic stand-in so the Spark-side plumbing (schema, batching,
partitioning) is real and tested.  Byte-level ops (hashing, sizing,
frame-timestamp planning) need no codec and run for real.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def media_struct(
    kind: Column | str,
    mime: Column | str,
    width: Column | None = None,
    height: Column | None = None,
    sample_rate: Column | None = None,
    duration_ms: Column | None = None,
) -> Column:
    """Build the canonical media metadata struct."""
    c = lambda v, t: (v if isinstance(v, Column) else F.lit(v)).cast(t)  # noqa: E731
    null = lambda t: F.lit(None).cast(t)  # noqa: E731
    return F.struct(
        c(kind, "string").alias("kind"),
        c(mime, "string").alias("mime"),
        (c(width, "int") if width is not None else null("int")).alias("width"),
        (c(height, "int") if height is not None else null("int")).alias("height"),
        (c(sample_rate, "int") if sample_rate is not None else null("int")).alias(
            "sample_rate"
        ),
        (
            c(duration_ms, "bigint") if duration_ms is not None else null("bigint")
        ).alias("duration_ms"),
    )


def content_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Codec-free byte stats — native exprs: size, sha256, magic-byte
    sniff of the container format."""
    c = F.col(content_col)
    magic = F.hex(F.substring(c, 1, 4))
    kind = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic == "89504E47", "image/png")
        .when(magic.startswith("4749"), "image/gif")
        .when(magic.startswith("494433"), "audio/mp3")
        .when(magic == "00000020", "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.withColumns(
        {
            "n_bytes": F.length(c).cast("long"),
            "sha256": F.sha2(c, 256),
            "sniffed_mime": kind,
        }
    )


#: decoder: (payload bytes, media row dict) -> dict of decoded fields
Decoder = Callable[[bytes, dict], dict]


def stub_decoder(payload: bytes, media: dict) -> dict:
    """Default decoder STUB — the real one needs PIL/ffmpeg, absent in
    this container by design."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; inject decoder= or use "
        "fake_decoder for deterministic tests"
    )


def fake_decoder(payload: bytes, media: dict) -> dict:
    """Deterministic stand-in decoder: derives 'decoded' properties
    purely from the bytes, so tests exercise the full Arrow path with
    stable results."""
    digest = hashlib.sha256(payload or b"").digest()
    w = media.get("width") or (digest[0] % 64 + 1)
    h = media.get("height") or (digest[1] % 64 + 1)
    return {
        "dec_width": int(w),
        "dec_height": int(h),
        "dec_mean_luma": float(sum(digest[:16]) / 16.0 / 255.0),
        "dec_channels": 3,
    }


DECODED_FIELDS = (
    "dec_width int, dec_height int, dec_mean_luma double, dec_channels int"
)


def decode_media(
    df: DataFrame,
    content_col: str = "content",
    media_col: str = "media",
    decoder: Decoder = stub_decoder,
) -> DataFrame:
    """Decode media bytes via Arrow-batched ``mapInPandas``.

    Output = input columns + ``DECODED_FIELDS``.  Batches stream
    through the Python worker (never a full-partition materialization),
    so executor memory is bounded by the Arrow batch size regardless of
    partition size — the property that matters at 100 TB.
    """
    out_schema = T.StructType(
        df.schema.fields + T.StructType.fromDDL(DECODED_FIELDS).fields
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        for pdf in batches:
            decoded = [
                decoder(
                    bytes(row[content_col]) if row[content_col] is not None else b"",
                    dict(row[media_col]) if row[media_col] is not None else {},
                )
                for _, row in pdf.iterrows()
            ]
            import pandas as pd

            yield pd.concat(
                [pdf.reset_index(drop=True), pd.DataFrame(decoded)], axis=1
            )

    return df.mapInPandas(run, schema=out_schema)


def plan_frame_samples(
    df: DataFrame,
    every_ms: int,
    media_col: str = "media",
    out_col: str = "frame_ts_ms",
) -> DataFrame:
    """Frame-sampling plan for video rows: timestamps (ms) to extract,
    every ``every_ms`` across the clip — native ``sequence``, no codec.
    Non-video rows and null durations get an empty plan."""
    dur = F.col(f"{media_col}.duration_ms")
    is_video = F.col(f"{media_col}.kind") == "video"
    plan = F.when(
        is_video & dur.isNotNull() & (dur > 0),
        F.sequence(F.lit(0).cast("bigint"), dur - 1, F.lit(every_ms).cast("bigint")),
    ).otherwise(F.array().cast("array<bigint>"))
    return df.withColumn(out_col, plan)


#: resizer: (payload bytes, media dict, width, height) -> resized bytes
Resizer = Callable[[bytes, dict, int, int], bytes]


def stub_resizer(payload: bytes, media: dict, width: int, height: int) -> bytes:
    """Default resize kernel STUB — the real one needs PIL/ffmpeg,
    absent in this container by design."""
    raise NotImplementedError(
        "image resize requires an image codec (PIL); inject resizer= "
        "or use fake_resizer for deterministic tests"
    )


def fake_resizer(payload: bytes, media: dict, width: int, height: int) -> bytes:
    """Deterministic stand-in resize kernel: emits a pseudo-bitmap of
    exactly ``width*height`` bytes derived from the source digest, so
    tests exercise the full Arrow path, output sizing, and metadata
    rewrite with stable results."""
    digest = hashlib.sha256(payload or b"")
    out = bytearray()
    block = digest.digest()
    while len(out) < width * height:
        out.extend(block)
        block = hashlib.sha256(block).digest()
    return bytes(out[: width * height])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    media_col: str = "media",
    resizer: Resizer = stub_resizer,
) -> DataFrame:
    """Resize image rows via the same Arrow-batched ``mapInPandas``
    plumbing as :func:`decode_media`: map-only (zero shuffles), batch-
    bounded memory, non-image rows passed through untouched.

    The codec kernel is injected (``resizer=``) — PIL/ffmpeg are absent
    here by design, so the REAL kernel stays a documented stub
    (:func:`stub_resizer`) while :func:`fake_resizer` drives the
    full-path tests.  The ``media`` struct is rewritten with the new
    dimensions so downstream metadata stays truthful.
    """
    schema = df.schema

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            out_content = []
            out_media = []
            for _, row in pdf.iterrows():
                media = dict(row[media_col]) if row[media_col] is not None else {}
                if media.get("kind") == "image" and row[content_col] is not None:
                    out_content.append(
                        resizer(bytes(row[content_col]), media, width, height)
                    )
                    media["width"], media["height"] = width, height
                    out_media.append(media)
                else:
                    out_content.append(row[content_col])
                    out_media.append(row[media_col])
            pdf = pdf.reset_index(drop=True)
            pdf[content_col] = pd.Series(out_content, dtype="object")
            pdf[media_col] = pd.Series(out_media, dtype="object")
            yield pdf

    return df.mapInPandas(run, schema=schema)
