"""Python-lane table functions ([ext] — §2.9 surface completion):
the Spark-4 lanes the engine exposes for per-row Python logic that
genuinely can't be expressed natively, demonstrated on sentence
splitting so every lane is provably row-identical to the native
fast path.

Three implementations of one contract (doc → (sent_id, sentence)):

* :func:`split_sentences_native` — ``posexplode(split(...))``, pure
  Catalyst, whole-stage codegen.  THE production path; the declared
  query ``q_sentence_split`` runs this.
* :class:`SentenceSplitUDTF` — a Python UDTF (lateral-join table
  function, arrow-optimized).  The lane for a real model-backed
  segmenter (spaCy/pysbd) where per-row Python is unavoidable.
* :func:`split_sentences_arrow` — ``mapInArrow`` over RecordBatches:
  zero pandas materialization, the right lane for binary-heavy
  batches (multimodal payloads) where pandas object boxing dominates.

Equality of all three is pinned in tests/test_udtf_ops.py; the
sentence regex is shared so the contract can't drift per lane.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Sentence boundary: one or more of .!? followed by whitespace.
#: Kept simple enough to express identically in Spark, Python `re`,
#: Arrow compute, and the DuckDB oracle (string_split_regex).
SENT_BOUNDARY = r"[.!?]+\s+"

_OUT_SCHEMA = "doc_id bigint, sent_id int, sentence string"


def split_sentences_native(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Native fast path: ``posexplode(split(text, boundary))``, empty
    trailing fragments dropped.  Zero Python, zero shuffle — the plan
    is Scan → Generate → Project inside whole-stage codegen."""
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.posexplode(F.split(F.trim(F.col(text_col)), SENT_BOUNDARY)).alias(
                "sent_id", "sentence"
            ),
        )
        .filter(F.length("sentence") > 0)
        .select("doc_id", F.col("sent_id").cast("int").alias("sent_id"), "sentence")
    )


def make_sentence_udtf():
    """Build the UDTF class + return ``(cls, spark_udtf)``.  Defined in
    a factory so importing this module never requires a live session
    and the class body stays pickle-clean for executor shipping."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType=_OUT_SCHEMA)
    class SentenceSplitUDTF:
        def eval(self, doc_id: int, text: str):  # noqa: D102
            if text is None:
                return
            for i, s in enumerate(re.split(SENT_BOUNDARY, text.strip())):
                if s:
                    yield doc_id, i, s

    return SentenceSplitUDTF


def split_sentences_udtf(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Python-UDTF lane: LATERAL table function per input row.  Slower
    than the native path (per-row Python) — exists for segmenters that
    need real Python per row; row-identical to
    :func:`split_sentences_native` for the shared regex (pinned in
    tests)."""
    spark = df.sparkSession
    spark.udtf.register("__jibaro_sentence_split", make_sentence_udtf())
    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    view = "__jibaro_sentence_src"
    src.createOrReplaceTempView(view)
    # A UDTF over per-row column args is a LATERAL table function —
    # the direct-call form only accepts constant args.
    return spark.sql(
        f"SELECT s.doc_id, s.sent_id, s.sentence "
        f"FROM {view}, LATERAL __jibaro_sentence_split(doc_id, text) s"
    )


def split_sentences_arrow(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``mapInArrow`` lane: the transform runs on pyarrow RecordBatches
    with NO pandas conversion — for batch shapes (binary/multimodal
    columns) where pandas object boxing is the dominant cost.  Here it
    carries the same sentence contract so equality is testable."""
    import re

    import pyarrow as pa

    pat = re.compile(SENT_BOUNDARY)

    def split_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id, out_sid, out_sent = [], [], []
            for did, text in zip(ids, texts):
                if text is None:
                    continue
                for i, s in enumerate(pat.split(text.strip())):
                    if s:
                        out_id.append(did)
                        out_sid.append(i)
                        out_sent.append(s)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_sid, type=pa.int32()),
                    pa.array(out_sent, type=pa.string()),
                ],
                names=["doc_id", "sent_id", "sentence"],
            )

    src = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInArrow(split_batches, _OUT_SCHEMA)
