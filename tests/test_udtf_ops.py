"""The three Python-lane table-function implementations (native
Generate, Python UDTF, mapInArrow) are row-identical on the fixture
corpus — the §2.9 lane-equality contract."""

from __future__ import annotations

from jibaro_spark.operators.udtf_ops import (
    split_sentences_arrow,
    split_sentences_native,
    split_sentences_udtf,
)
from jibaro_spark.queries.registry import load_tables

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.doc_id, r.sent_id, r.sentence) for r in df.collect()
    )


def test_udtf_matches_native(spark):
    docs = load_tables(spark, SF, "documents")["documents"]
    assert _rows(split_sentences_udtf(docs)) == _rows(split_sentences_native(docs))


def test_arrow_matches_native(spark):
    docs = load_tables(spark, SF, "documents")["documents"]
    assert _rows(split_sentences_arrow(docs)) == _rows(split_sentences_native(docs))


def test_null_and_empty_text_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "One. Two! Three?")],
        "doc_id long, text string",
    )
    for fn in (split_sentences_native, split_sentences_udtf, split_sentences_arrow):
        got = _rows(fn(df))
        assert [r[0] for r in got] == [4, 4, 4], (fn.__name__, got)
        # boundary is punct+whitespace, so document-final punctuation
        # (no trailing space) stays attached — the defined contract
        assert [r[2] for r in got] == ["One", "Two", "Three?"], (fn.__name__, got)


def test_native_plan_is_generate_no_python(spark):
    docs = load_tables(spark, SF, "documents")["documents"]
    plan = split_sentences_native(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
