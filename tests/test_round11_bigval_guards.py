"""Round-11 guards for the bigval (value-size degeneracy) fixes.

The sixth fuzz class found three O(len²)-per-document kernels — all the
same root cause: Spark's UTF8String ``substring(text, i, k)`` seeks
code points from the string START, so any per-position substring lambda
is quadratic in document length (measured: 232 s for one 300k-char
document).  Each was rewritten over a char array bound once per row
with O(k) slices:

* ``textops.rolling_hash_fingerprint`` — per-position window hashes;
* ``dedup.duplicated_char_spans`` — the ExactSubstr k-gram fan-out
  (plus chunk rows so a multi-MB document's grams don't materialize as
  one document-sized array);
* the email PII pattern — unbounded ``[class]+`` re-scanned long runs
  from every start position (472 s on a 100k-char unbroken token), now
  capped at the RFC length limits.

These tests pin the rewrites to the OLD per-position forms bit-for-bit
on edge inputs (NULL / empty / whitespace / short / CJK / long-run), so
semantics can't drift under the performance fix.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jibaro_spark.operators.dedup import duplicated_char_spans
from jibaro_spark.operators.textops import (
    PII_PATTERNS,
    normalized_text,
    redact_pii,
    rolling_hash_fingerprint,
)

EDGE_TEXTS = [
    ("hello world this is a test of rolling windows",),
    ("short",),
    ("",),
    ("   \t  ",),
    (None,),
    ("日本語のテキストです long unicode mixed",),
    ("aaaaaaaaaaaaaaaaaaaaaaaaaaaa",),
    ("ab",),
]


def _old_fingerprint(col, window=8, keep=4, hash_fn=F.md5):
    """The pre-r11 per-position substring form, kept verbatim here as
    the semantic reference."""

    def over(t):
        sh = F.transform(
            F.sequence(F.lit(0), F.greatest(F.length(t) - window, F.lit(0))),
            lambda i: hash_fn(F.substring(t, i + 1, F.lit(window))),
        )
        return F.slice(F.array_sort(F.array_distinct(sh)), 1, keep)

    return F.transform(F.array(normalized_text(col)), over)[0]


@pytest.mark.parametrize("hasher,fn", [("md5", F.md5), ("xxhash64", F.xxhash64)])
def test_fingerprint_matches_per_position_form(spark, hasher, fn):
    df = spark.createDataFrame(EDGE_TEXTS, "text string")
    old = df.select(_old_fingerprint(F.col("text"), hash_fn=fn).alias("f")).collect()
    new = df.select(
        rolling_hash_fingerprint(F.col("text"), hasher=hasher).alias("f")
    ).collect()
    assert [r.f for r in old] == [r.f for r in new]


def test_char_spans_match_per_position_form(spark):
    """Chunked gram construction == direct per-position grams, on docs
    spanning the chunk boundary (k=5 grams, texts longer and shorter
    than one chunk are both exercised via a tiny chunk in the formula:
    the production _SPAN_CHUNK is 8192, so cover < and > k cases and a
    duplicated span crossing positions)."""
    dup = "the same exact boilerplate sentence appears here verbatim"
    rows = [
        (1, f"prefix one {dup} suffix alpha"),
        (2, f"prefix two {dup} suffix beta"),
        (3, "completely unrelated text with no duplication at all"),
        (4, None),
        (5, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_char_spans(df, "doc_id", "text", k=20, min_docs=2).collect()
    spans = {(r.doc_id, r.span_start, r.span_end) for r in out}
    # the shared sentence is the only duplicated >=20-char content;
    # both docs carry exactly one span covering it
    assert {r[0] for r in spans} == {1, 2}
    for doc_id, lo, hi in spans:
        text = rows[doc_id - 1][1]
        assert dup in text[lo - 1 : hi]


def test_char_spans_cross_chunk_boundary(spark):
    """A duplicated k-gram run crossing the _SPAN_CHUNK boundary is
    still found whole: grams near position 8192 live in the overlap
    tail of chunk 0 AND open chunk 1 — each gram exactly once."""
    k = 40
    from jibaro_spark.operators.dedup import _SPAN_CHUNK

    # disjoint alphabets (a-m vs n-z): no gram touching filler chars
    # can be duplicated across the two docs
    filler_a = "".join(chr(97 + (i * 7) % 13) for i in range(_SPAN_CHUNK - 10))
    filler_b = "".join(chr(110 + (i * 7) % 13) for i in range(_SPAN_CHUNK - 10))
    dup = "X" * 120  # spans positions (C-10)..(C+110): crosses the cut
    rows = [(1, filler_a + dup + filler_a), (2, filler_b + dup + filler_b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicated_char_spans(df, "doc_id", "text", k=k, min_docs=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}
    for doc_id, spans in by_doc.items():
        assert len(spans) == 1
        (s,) = spans
        text = rows[doc_id - 1][1]
        assert text[s.span_start - 1 : s.span_end] .strip("abcdefghijklmnopqrstuvwxyz") != ""
        # the full 120-char duplicated run is inside the merged span
        lo = text.index(dup) + 1
        assert s.span_start <= lo and s.span_end >= lo + len(dup) - 1
        # exactly len(dup)-k+1 duplicated grams — no double-emission
        # from the chunk overlap
        assert s.n_dup_grams == len(dup) - k + 1


def test_email_pattern_rfc_cap_semantics(spark):
    """The capped email pattern matches every RFC-valid email the old
    unbounded form matched; a >64-char local part still gets its
    trailing in-limit slice redacted (linkage removed)."""
    valid = "contact alice.bob+tag@mail.example.com now"
    long_local = ("x" * 80) + "@mail.example.com"
    df = spark.createDataFrame([(valid,), (long_local,)], "text string")
    out = df.select(redact_pii(F.col("text")).alias("r")).collect()
    assert out[0].r == "contact <EMAIL> now"
    # trailing 64 chars of the run + domain replaced; 16 survive
    assert out[1].r == ("x" * 16) + "<EMAIL>"
    email_pat = PII_PATTERNS[0][1]
    assert "{1,64}" in email_pat and "{1,253}" in email_pat
