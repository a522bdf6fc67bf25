"""Unit tests: catalog/config path conventions (M0), relational helper
operators, salted join equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jibaro_spark.catalog import Catalog, Layer, TableRef
from jibaro_spark.config import Settings
from jibaro_spark.operators.relational import salted_join, top_k_per_group


def test_catalog_paths():
    cat = Catalog(Settings(protocol="s3a"))
    ref = TableRef(str(Layer.CURATED), "proj", "db", "tbl")
    assert cat.path(ref) == "s3a://curated/proj/db/tbl"
    assert (
        cat.checkpoint_path(ref)
        == "s3a://spark-control/_checkpoint/curated/proj/db/tbl"
    )
    assert cat.history_path(ref) == "s3a://spark-control/_history/curated/proj/db/tbl"


def test_catalog_file_protocol(tmp_path):
    cat = Catalog(Settings(protocol="file", base_path=str(tmp_path)))
    ref = cat.ref(Layer.RAW, "p", "d", "t")
    assert cat.path(ref) == f"{tmp_path}/raw/p/d/t"


def test_tableref_validation():
    with pytest.raises(ValueError):
        TableRef("raw", "a/b", "db", "t")
    with pytest.raises(ValueError):
        TableRef("raw", "", "db", "t")
    assert TableRef("raw", "p", "d", "t").with_layer(Layer.STAGED).layer == "staged"


def test_settings_env_and_toml(tmp_path):
    toml = tmp_path / "s.toml"
    toml.write_text('protocol = "s3a"\ncompact_min_files = 5\n')
    s = Settings.load(str(toml), env={"JIBARO_SPARK_VACUUM_RETENTION_HOURS": "24"})
    assert s.protocol == "s3a"
    assert s.compact_min_files == 5
    assert s.vacuum_retention_hours == 24
    with pytest.raises(ValueError):
        s.bucket_for("nope")


def test_salted_join_equals_plain_join(spark):
    """Salting must be semantically invisible — identical rows to the
    plain join, with the hot key spread across salt buckets."""
    left = spark.range(0, 2000).select(
        (F.when(F.col("id") % 10 != 0, F.col("id") % 50).otherwise(7)).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(50)], "k long, name string"
    )
    plain = sorted((r.k, r.v, r.name) for r in left.join(right, "k").collect())
    salted = sorted(
        (r.k, r.v, r.name)
        for r in salted_join(left, right, "k", "k", salt=8).drop(right.k).collect()
    )
    assert salted == plain


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8)], "g string, x int"
    )
    got = {
        (r.g, r.x)
        for r in top_k_per_group(df, ["g"], [F.col("x").desc()], k=2).collect()
    }
    assert got == {("a", 3), ("a", 2), ("b", 9), ("b", 8)}


def test_exact_quantiles_both_forms_match_builtin(spark):
    import random

    from pyspark.sql import functions as F

    from jibaro_spark.operators.relational import (
        exact_quantiles,
        exact_quantiles_bucketed,
    )

    rng = random.Random(7)
    rows = [
        (g, round(rng.uniform(0, 1000), 2) if g != "c" else 42.0)
        for g in ("a", "b", "c")
        for _ in range(997)
    ] + [("d", 5.0)]  # constant group + singleton group edge cases
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
    probs = [(0.5, "p50"), (0.95, "p95"), (0.01, "p01")]
    expected = {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {p})").alias(name)
                for p, name in probs
            ]
        )
        .collect()
    }
    for fn in (exact_quantiles, exact_quantiles_bucketed):
        got = {r["g"]: r for r in fn(df, ["g"], "v", probs).collect()}
        assert set(got) == set(expected), fn.__name__
        for g, row in expected.items():
            for _, name in probs:
                assert got[g][name] == pytest.approx(row[name], abs=1e-9), (
                    fn.__name__,
                    g,
                    name,
                )


def test_partitioned_prefix_sum_matches_global_window(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from jibaro_spark.operators.relational import partitioned_prefix_sum

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("v")
    ).repartition(8)
    got = {
        r.id: r.cum
        for r in partitioned_prefix_sum(df, "id", "v", chunk_width=64).collect()
    }
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    expected = {r.id: r.cum for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == expected


def test_repetition_stats_edges_and_ties(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.textops import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: "a b","b a","a b","b a" -> tie at 2, "a b" wins
            (2, "x"),            # single token -> one clamped shingle "x"
            (3, "  "),           # whitespace-only -> norm "" -> one gram ""
            (4, "c c c c"),      # "c c" x3 -> dup_frac 2/3
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert rows[1].top_gram == "a b" and rows[1].top_count == 2
    assert rows[1].n_grams == 4 and rows[1].n_distinct == 2
    assert rows[2].n_grams == 1 and rows[2].top_gram == "x"
    assert rows[2].top_char_frac == 1.0
    assert rows[3].top_char_frac == 0.0  # len-0 guard, no NaN
    assert abs(rows[4].dup_frac - 2.0 / 3.0) < 1e-12
    assert rows[4].top_count == 3


def test_ngram_contamination_overlap_and_disjoint(spark):
    from jibaro_spark.operators.textops import ngram_contamination

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely different words here entirely now"),
            (3, "quick brown fox jumps again and again today"),
        ],
        "doc_id int, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox jumps happily")], "doc_id int, text string"
    )
    got = {
        r.doc_id: r.n_shared
        for r in ngram_contamination(train, ev, "doc_id", "text", n=4).collect()
    }
    # doc1 shares "quick brown fox jumps"; doc3 shares it too; doc2 none
    assert got == {1: 1, 3: 1}


def test_quantize_int8_reconstruction_and_zero_vector(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [3.0]),
        ],
        "vec_id int, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_int8(df, "vec_id", "embedding").collect()}
    # max |x| maps to exactly ±127; reconstruction error bounded by scale/2
    assert out[1].q_min == -127 and out[1].n_sat == 1
    for r in (out[1], out[3]):
        for x, q in zip(r["__v"], r.qvec):
            assert abs(x - q * r.scale) <= r.scale / 2 + 1e-12
    assert out[2].scale == 0.0 and out[2].q_sum == 0 and out[2].n_sat == 0
    assert out[3].q_max == 127


def test_chunk_documents_overlap_and_short_docs(spark):
    from jibaro_spark.operators.textops import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "only three tokens")],
        "doc_id int, text string",
    )
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, stride=3).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    d1 = [r for r in rows if r.doc_id == 1]
    # 10 tokens, stride 3 -> chunks start at 0,3,6,9 -> 4 chunks
    assert [r.chunk_id for r in d1] == [0, 1, 2, 3]
    assert d1[0].chunk_text == "t0 t1 t2 t3"
    assert d1[1].chunk_text == "t3 t4 t5 t6"      # 1-token overlap
    assert d1[3].chunk_text == "t9" and d1[3].n_tokens == 1
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].chunk_text == "only three tokens"


def test_minhash_signature_md5_determinism(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.dedup import minhash_signature_md5

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "  ALPHA   beta GAMMA delta epsilon "),  # normalizes to same
            (3, "totally different content here now"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: r.sig
        for r in df.select(
            "doc_id", minhash_signature_md5(F.col("text")).alias("sig")
        ).collect()
    }
    assert rows[1] == rows[2], "normalization-equal docs must share signatures"
    assert rows[1] != rows[3]


def test_simhash_md5_bits_properties(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.dedup import simhash_md5_bits

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, " Alpha  BETA gamma delta epsilon zeta"),  # same normalized
            (3, "alpha beta gamma delta epsilon eta"),     # 1 token changed
            (4, "completely unrelated words appear here"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: r.bits
        for r in df.select(
            "doc_id", simhash_md5_bits(F.col("text")).alias("bits")
        ).collect()
    }
    assert all(len(b) == 64 and set(b) <= {"0", "1"} for b in rows.values())
    assert rows[1] == rows[2]
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))
    # near-dup hamming must be well under unrelated hamming
    assert ham(rows[1], rows[3]) < ham(rows[1], rows[4])


def test_redact_pii_counts_and_scrub(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.textops import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+x@ex.co and c@d.org ip 10.0.0.1 tel +1-555-201-0042"),
            (2, "no pii here at all"),
            (3, "ip only 192.168.001.255 trailing"),
        ],
        "id int, t string",
    )
    c = pii_counts(F.col("t"))
    out = {
        r.id: r
        for r in df.select(
            "id",
            c["email"].alias("e"),
            c["ipv4"].alias("i"),
            c["phone"].alias("p"),
            redact_pii(F.col("t")).alias("red"),
        ).collect()
    }
    assert (out[1].e, out[1].i, out[1].p) == (2, 1, 1)
    assert out[1].red == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE>"
    assert (out[2].e, out[2].i, out[2].p) == (0, 0, 0)
    assert out[2].red == "no pii here at all"
    assert out[3].i == 1 and out[3].red == "ip only <IP> trailing"


def test_assign_nearest_matches_numpy_argmin(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from jibaro_spark.operators.similarity import assign_nearest

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 6).astype("float32")
    cents = vecs[:5]  # first 5 points are the codebook → exact-zero ties
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vid int, vec array<float>",
    )
    cdf = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(cents)],
        "cid int, cvec array<float>",
    )
    got = {
        r.vid: (r.cid, r.d2)
        for r in assign_nearest(df, "vid", "vec", cdf).collect()
    }
    d = ((vecs[:, None, :].astype("float64") - cents[None].astype("float64")) ** 2).sum(2)
    for i in range(40):
        want = int(np.argmin(np.round(d[i], 6)))  # np.argmin = first min → low-cid tie-break
        assert got[i][0] == want, (i, got[i], d[i])
        assert abs(got[i][1] - d[i][want]) < 1e-5
    # codebook members sit at distance 0 of themselves
    assert all(got[i] == (i, 0.0) for i in range(5))


def test_zorder_value_and_layout_locality(spark):
    from pyspark.sql import functions as F

    from jibaro_spark.operators.relational import layout_zorder, zorder_value

    def morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 13)]
    df = spark.createDataFrame(pts, "x int, y int")
    got = df.select("x", "y", zorder_value(F.col("x"), F.col("y")).alias("z")).collect()
    assert all(r.z == morton(r.x, r.y) for r in got)

    # layout locality: with 16 range partitions over z, every partition's
    # x-span AND y-span must be far below the naive full range (a
    # single-key sort bounds only its leading key)
    laid = layout_zorder(df, "x", "y", num_partitions=16)
    spans = (
        laid.select("x", "y", F.spark_partition_id().alias("p"))
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("xs"),
            (F.max("y") - F.min("y")).alias("ys"),
        )
        .collect()
    )
    assert len(spans) >= 8
    assert max(r.xs for r in spans) <= 128
    assert max(r.ys for r in spans) <= 128


def test_priority_sample_formula_and_determinism(spark):
    import hashlib

    from pyspark.sql import functions as F

    from jibaro_spark.operators.relational import priority_sample

    rows = [(i, (i * 7) % 40 + 1) for i in range(200)] + [(900, 0), (901, -3)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = priority_sample(df, "id", "w", 20).collect()
    assert len(got) == 20
    assert all(r.id not in (900, 901) for r in got)  # w<=0 excluded

    # python reimplementation of the same priority
    def prio(i, w):
        u_int = int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16)
        return ((u_int + 0.5) / 16**13) / w

    want = sorted(((prio(i, w), i) for i, w in rows if w > 0))[:20]
    assert [r.id for r in got] == [i for _, i in want]
    assert all(abs(r.priority - p) < 1e-18 for r, (p, _) in zip(got, want))

    # repartitioning must not change the sample (global bottom-k)
    got2 = priority_sample(df.repartition(7), "id", "w", 20).collect()
    assert [r.id for r in got2] == [r.id for r in got]


def test_pagerank_vs_numpy_power_iteration(spark):
    import numpy as np

    from jibaro_spark.operators.graph import pagerank

    edges = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "c", 3.0), ("d", "a", 1.0),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r.node: float(r.pr)
        for r in pagerank(df, weight="w", iterations=3, damping=0.85).collect()
    }
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    M = np.zeros((n, n))
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    for s, d, w in edges:
        M[idx[d], idx[s]] += w / outw[s]
    pr = np.full(n, 1.0 / n)
    for _ in range(3):
        pr = 0.15 / n + 0.85 * (M @ pr)
    for node in nodes:
        assert abs(got[node] - pr[idx[node]]) < 1e-9, (node, got[node], pr[idx[node]])
    # 'c' has the most weighted in-links → top rank
    assert max(got, key=got.get) == "c"


def _python_bpe(word_counts: dict, num_merges: int, min_freq: int = 2):
    """Sequential reference BPE (Sennrich'16 formulation) for pinning
    the distributed trainer: same tiebreak (freq DESC, left, right),
    same left-to-right single-pass merge."""
    seqs = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for r in range(num_merges):
        counts: dict = {}
        for syms, c in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, rt), freq = best
        if freq < min_freq:
            break
        merges.append((r, l, rt, freq))
        out = {}
        for syms, c in seqs.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rt:
                    res.append(l + rt)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + c
        seqs = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    from jibaro_spark.operators.bpe import bpe_train

    wc = {
        "lower": 6, "lowest": 3, "newer": 8, "newest": 5,
        "wider": 2, "low": 9, "new": 4, "a": 7,
    }
    df = spark.createDataFrame(list(wc.items()), "w string, n long")
    got = bpe_train(df, "w", "n", num_merges=10)
    want = _python_bpe(wc, 10)
    assert got == want
    assert len(got) >= 8  # the corpus supports at least 8 merges


def test_bpe_merge_pair_fold_semantics(spark):
    """Left-to-right one-pass merge: 'aaa' with (a,a) -> [aa, a];
    'aaaa' -> [aa, aa]; non-adjacent symbols untouched."""
    from pyspark.sql import functions as F

    from jibaro_spark.operators.bpe import _merge_pair

    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("aba",), ("",)], "s string"
    )
    rows = df.select(
        F.col("s"), _merge_pair(F.split("s", ""), "a", "a").alias("m")
    ).collect()
    got = {r.s: list(r.m) for r in rows}
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aba"] == ["a", "b", "a"]
    assert got[""] in ([], [""])  # split('') of empty string is engine-edge


def test_bpe_apply_roundtrip(spark):
    """bpe_apply with the learned merges reproduces the reference
    tokenization of held-out words."""
    from pyspark.sql import functions as F

    from jibaro_spark.operators.bpe import bpe_apply, bpe_train

    wc = {"hugging": 5, "hugged": 4, "hugs": 6, "hub": 3}
    df = spark.createDataFrame(list(wc.items()), "w string, n long")
    merges = bpe_train(df, "w", "n", num_merges=6)
    toks = df.select(
        "w", bpe_apply(F.split("w", ""), merges).alias("t")
    ).collect()
    # apply the same merges sequentially in python
    for r in toks:
        syms = list(r.w)
        for _, l, rt, _ in merges:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == rt:
                    res.append(l + rt)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        assert list(r.t) == syms, r.w


def test_snapshot_diff_statuses_and_null_transitions(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from jibaro_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, "d", 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (5, "e", 50.0)],
        "id long, s string, v double",
    )
    rows = {r.id: r for r in snapshot_diff(old, new, ["id"]).collect()}
    assert 1 not in rows  # unchanged rows dropped
    assert rows[2].status == "changed" and list(rows[2].changed_cols) == ["v"]
    assert rows[3].status == "changed" and list(rows[3].changed_cols) == ["s"]
    assert rows[4].status == "removed" and list(rows[4].changed_cols) == []
    assert rows[5].status == "added" and list(rows[5].changed_cols) == []
