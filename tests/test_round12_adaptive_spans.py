"""Round-12 guards for duplicated_char_spans' adaptive chunking
(VERDICT r11 #5): the one-row max-length probe must route small-doc
corpora to the pre-chunking plan and any corpus with an over-chunk
document to the chunked plan, with BIT-IDENTICAL results in both
regimes — the same adaptive-plan discipline as _exact_text_collapse.
"""

from __future__ import annotations

import pytest

from jibaro_spark.operators.dedup import _SPAN_CHUNK, duplicated_char_spans


def _rows(spark, with_big=False):
    boiler = "the quick brown fox jumps over the lazy dog " * 3
    rows = [
        (1, f"alpha {boiler} omega one"),
        (2, f"beta {boiler} omega two"),
        (3, "entirely unique text with no duplicated spans at all here"),
        (4, None),
        (None, f"null-id {boiler}"),
    ]
    if with_big:
        rows.append((5, "x" * (_SPAN_CHUNK + 200) + boiler))
        rows.append((6, "y" * (_SPAN_CHUNK + 200) + boiler))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_both_regimes_bit_identical_small(spark):
    df = _rows(spark)
    never = _snap(duplicated_char_spans(df, k=20, chunking="never"))
    always = _snap(duplicated_char_spans(df, k=20, chunking="always"))
    adaptive = _snap(duplicated_char_spans(df, k=20, chunking="adaptive"))
    assert never == always == adaptive
    assert len(never) > 0  # boilerplate spans found, not vacuous


def test_both_regimes_bit_identical_big(spark):
    df = _rows(spark, with_big=True)
    always = _snap(duplicated_char_spans(df, k=20, chunking="always"))
    adaptive = _snap(duplicated_char_spans(df, k=20, chunking="adaptive"))
    assert always == adaptive
    assert any(r[0] in (5, 6) for r in always)  # big docs' spans present


def test_adaptive_routing(spark, monkeypatch):
    """Adaptive picks 'never' iff every doc fits one chunk."""
    import jibaro_spark.operators.dedup as D

    picked = {}
    real = D._merge_dup_spans

    def spy(grams, id_col, k, min_docs):
        # the pre-chunking plan has no 'off' column upstream; detect
        # the regime from the plan string
        picked["chunked"] = "__ch" in grams._jdf.queryExecution().logical().toString()
        return real(grams, id_col, k, min_docs)

    monkeypatch.setattr(D, "_merge_dup_spans", spy)
    duplicated_char_spans(_rows(spark), k=20).collect()
    assert picked["chunked"] is False
    duplicated_char_spans(_rows(spark, with_big=True), k=20).collect()
    assert picked["chunked"] is True


def test_chunking_validation(spark):
    with pytest.raises(ValueError):
        duplicated_char_spans(_rows(spark), chunking="sometimes")
