"""Round-6 operator units: sparse TF-IDF cosine vs a numpy reference,
and the SCD2 point-in-time join's interval semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_tfidf_cosine_pairs_matches_numpy(spark):
    """The inverted-index decimal-summed cosine equals the dense
    numpy TF-IDF cosine on a hand-sized corpus."""
    import numpy as np

    from jibaro_spark.operators.textops import tfidf_cosine_pairs

    texts = {
        1: "spark join stream batch join",
        2: "spark join stream batch",
        3: "window merge table column",
        4: "window merge table",
        5: "totally different words here",
    }
    docs = spark.createDataFrame(
        [(i, t, "g") for i, t in texts.items()], "doc_id long, text string, source string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", group_col="source", min_cosine=0.0
        ).collect()
    }

    # numpy reference
    vocab = sorted({w for t in texts.values() for w in t.split()})
    N = len(texts)
    dfreq = {w: sum(1 for t in texts.values() if w in t.split()) for w in vocab}
    vecs = {}
    for i, t in texts.items():
        v = np.zeros(len(vocab))
        for j, w in enumerate(vocab):
            tf = t.split().count(w)
            if tf:
                v[j] = tf * math.log(N / dfreq[w])
        vecs[i] = v
    for (a, b), c in got.items():
        va, vb = vecs[a], vecs[b]
        expect = float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert c == pytest.approx(expect, abs=2e-6), (a, b)
    # disjoint-vocab pair has zero cosine
    assert got.get((1, 5), 0.0) == pytest.approx(0.0, abs=1e-9)
    # same-topic pairs beat cross-topic pairs (absent = no shared term
    # = cosine 0; docs 1 and 3 share no vocabulary)
    assert got[(1, 2)] > got.get((1, 3), 0.0)


def test_tfidf_cosine_group_guard_blocks_cross_group(spark):
    from jibaro_spark.operators.textops import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "same words", "a"), (2, "same words", "b")],
        "doc_id long, text string, source string",
    )
    out = tfidf_cosine_pairs(
        docs, "doc_id", "text", group_col="source", min_cosine=0.0
    ).collect()
    assert out == []


def test_scd2_pointintime_resolves_validity_interval(spark):
    """A fact before the effective date hits the EXPIRED version, one
    after hits the fresh version — membership, not nearest."""
    from jibaro_spark.operators.cdc import scd2_apply

    dim = spark.createDataFrame(
        [(1, 10.0, "2020-01-01", None)],
        "k long, price double, valid_from string, valid_to string",
    ).select(
        "k", "price",
        F.col("valid_from").cast("date").alias("valid_from"),
        F.col("valid_to").cast("date").alias("valid_to"),
    )
    chg = spark.createDataFrame(
        [(1, 99.0, "2021-06-01")], "k long, price double, eff string"
    ).select("k", "price", F.col("eff").cast("date").alias("eff"))
    scd2 = scd2_apply(dim, chg, keys=["k"], effective_col="eff")
    facts = spark.createDataFrame(
        [("2020-07-01",), ("2022-01-01",)], "fd string"
    ).select(F.lit(1).alias("k2"), F.col("fd").cast("date").alias("fd"))
    j = facts.join(
        scd2,
        (F.col("k2") == F.col("k"))
        & (F.col("fd") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fd") < F.col("valid_to"))),
    ).select("fd", "price").collect()
    got = {str(r["fd"]): r["price"] for r in j}
    assert got == {"2020-07-01": 10.0, "2022-01-01": 99.0}
