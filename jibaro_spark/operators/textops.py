"""Text-analysis operators for LLM data pipelines ([ext], SURVEY §7.2 M6).

All of these are **native column expressions** (split/transform/filter/
aggregate) — they run inside whole-stage codegen with zero Python
round-trips, which is the difference between feasible and infeasible at
100 TB.  A pandas-UDF escape hatch exists for genuinely procedural
scoring (see :mod:`jibaro_spark.operators.multimodal` for the pattern).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Minimal per-language stopword sets for the n-gram/stopword heuristic
#: language identifier.  Deliberately tiny: language ID at pipeline
#: scale is a heuristic scorer, not a classifier download.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "dans", "pour"],
}


def normalized_text(col: Column) -> Column:
    """Lowercase, trim, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(normalized_text(col), " ")


def token_count(col: Column) -> Column:
    """Whitespace token count (empty text → 0)."""
    return F.when(F.length(F.trim(col)) == 0, F.lit(0)).otherwise(
        F.size(tokens(col))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: count of matches of a BPE-flavored
    regex (word pieces of ≤4 chars, digits, punctuation) — a cheap,
    deterministic proxy for tokenizer cost accounting."""
    pieces = F.regexp_extract_all(
        F.lower(col), F.lit(r"([a-z]{1,4}|[0-9]|[^a-z0-9\s])"), 1
    )
    return F.size(pieces)


def stopword_hits(col: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(col)), sw))


def language_id(col: Column) -> Column:
    """Heuristic language ID by stopword-hit voting (deterministic
    priority en > es > de > fr on ties)."""
    c_en, c_es, c_de, c_fr = (stopword_hits(col, lg) for lg in ("en", "es", "de", "fr"))
    return (
        F.when((c_en >= c_es) & (c_en >= c_de) & (c_en >= c_fr), "en")
        .when((c_es >= c_de) & (c_es >= c_fr), "es")
        .when(c_de >= c_fr, "de")
        .otherwise("fr")
    )


def quality_features(col: Column) -> dict[str, Column]:
    """Deterministic quality-signal columns (single IEEE divisions only,
    so Spark and any oracle engine agree bit-for-bit).

    ``try_divide`` instead of ``/``: a zero-token or zero-char document
    (empty/whitespace text — absent from the sf fixtures but real in
    any crawled corpus) must yield NULL features, not crash the job
    under ANSI mode.  NULL is also exactly what SQL engines produce
    for x/0 (DuckDB returns NULL), so the oracle twin agrees without
    special-casing; results on non-degenerate text are bit-identical.
    """
    toks = tokens(col)
    n_tok = F.size(toks).cast("double")
    n_char = F.length(col).cast("double")
    n_alpha = F.length(F.regexp_replace(col, r"[^A-Za-z]", "")).cast("double")
    n_punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", "")).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    return {
        "n_tokens": n_tok.cast("long"),
        "avg_token_len": F.try_divide(n_char - (n_tok - 1), n_tok),
        "alpha_ratio": F.try_divide(n_alpha, n_char),
        "punct_ratio": F.try_divide(n_punct, n_char),
        "uniq_token_ratio": F.try_divide(n_uniq, n_tok),
    }


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]-ish: rewards alphabetic content
    and lexical diversity, penalizes extreme punctuation.  Fixed
    left-to-right expression order for cross-engine determinism."""
    f = quality_features(col)
    return (
        f["alpha_ratio"] * F.lit(0.5)
        + f["uniq_token_ratio"] * F.lit(0.4)
        + (F.lit(1.0) - f["punct_ratio"]) * F.lit(0.1)
    )


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 hex of normalized text (stable across
    engines — DuckDB md5() produces the same hex)."""
    return F.md5(normalized_text(col))


def rolling_hash_fingerprint(
    col: Column, window: int = 8, keep: int = 4, hasher: str = "xxhash64"
) -> Column:
    """Winnowing-style document fingerprint: k-gram rolling hashes →
    keep the ``keep`` smallest (as a sorted array) — a compact sketch
    for containment checks.  Native exprs only; the normalized text is
    bound once per row via a 1-element-array lambda (inlining it in the
    per-position lambda would re-run the regex ~|text| times).

    ``hasher``: ``"xxhash64"`` (default — fastest JVM hash, sketch is
    ``array<long>``) or ``"md5"`` (hex-string hashes, bit-identical in
    DuckDB/Trino/Postgres — the cross-engine-verifiable mode, ~3×
    slower; sketch is ``array<string>``)."""
    if hasher not in ("xxhash64", "md5"):
        raise ValueError(f"hasher must be xxhash64|md5, got {hasher!r}")
    hash_fn = F.xxhash64 if hasher == "xxhash64" else F.md5

    def over(t: Column) -> Column:
        # k-gram windows over the CHAR ARRAY, not substring(t, i, w):
        # UTF8String substring seeks code points from the string start,
        # so the per-position form is O(len²) per document — the bigval
        # fixture's 1.5 MB document never finished (r11).  The char
        # array is bound once via its own 1-element-array lambda (an
        # inline split would re-split per position); slice(cs, j, w) is
        # an O(w) array copy.
        def body(cs: Column) -> Column:
            # incremental bottom-`keep` fold, NOT materialize-all-then-
            # sort: transform+array_distinct holds every window hash of
            # the document at once (a 1.5 MB doc = 1.5M hashes → 5.4 GB
            # transient heap, the bigval memory band's worst finding).
            # The running accumulator of the `keep` smallest DISTINCT
            # hashes is O(keep) per step and equals
            # slice(array_sort(array_distinct(all)), 1, keep) exactly:
            # a hash evicted from the bottom-k can never re-enter (the
            # accumulator's max only decreases), and duplicates of kept
            # hashes are skipped by the contains check.
            acc0 = F.array().cast(
                "array<string>" if hasher == "md5" else "array<bigint>"
            )

            def step(acc: Column, j: Column) -> Column:
                h = hash_fn(F.concat_ws("", F.slice(cs, j, window)))
                # fast path: once the accumulator is full, a hash at or
                # above the kept maximum can neither enter nor be a new
                # distinct member — P(insert) ~ keep/i, so all but
                # O(keep·ln n) windows take the allocation-free branch.
                # F.get returns NULL while acc is short, and
                # (size>=keep) & (h >= NULL) is false under Kleene
                # logic, so the slow path runs until the acc fills.
                at_cap = F.size(acc) >= keep
                skip = at_cap & (h >= F.get(acc, F.lit(keep - 1)))
                inserted = F.slice(
                    F.array_sort(F.concat(acc, F.array(h))), 1, keep
                )
                return F.when(skip, acc).otherwise(
                    F.when(F.array_contains(acc, h), acc).otherwise(inserted)
                )

            return F.aggregate(
                F.sequence(
                    F.lit(1), F.greatest(F.size(cs) - (window - 1), F.lit(1))
                ),
                acc0,
                step,
            )

        # NULL input: the old per-position form yielded one NULL-input
        # hash window — [NULL] under md5, [seed 42] under xxhash64
        # (xxhash64 never returns NULL) — preserved exactly
        null_sketch = F.array(hash_fn(F.lit(None).cast("string")))
        return F.when(t.isNull(), null_sketch).otherwise(
            F.transform(F.array(F.split(t, "")), body)[0]
        )

    return F.transform(F.array(normalized_text(col)), over)[0]


def repetition_stats(
    df: "DataFrame", id_col: str, text_col: str, n: int = 2
) -> "DataFrame":
    """Gopher-style per-document repetition signals over word n-grams.

    For each doc: total / distinct n-gram counts, the most frequent
    n-gram (ties broken by lexicographic order), the duplicate-n-gram
    fraction, and the fraction of normalized characters covered by the
    top n-gram's occurrences — the "rep-2gram" family of quality
    filters used to drop boilerplate / looping text from training
    corpora.

    Shape: ZERO shuffles.  A document's n-grams all live in its own
    row, so the per-doc mode never needs an explode→groupBy over the
    corpus (that variant shuffles every n-gram instance — measured 4×
    slower at sf0.1 and unbounded shuffle growth with corpus size).
    Instead: sort the gram array, then one ``aggregate`` pass finds the
    longest run (ascending sort order makes strict-``>`` replacement
    implement the lexicographic tie-break for free).  Everything stays
    in a single Project — embarrassingly parallel at any scale.
    Shingling reuses :func:`jibaro_spark.operators.dedup.shingles`
    (short docs yield one clamped shingle); the sorted array is bound
    once via the 1-element-array lambda (see the expression-inlining
    note on ``shingles``).
    """
    from jibaro_spark.operators.dedup import shingles

    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit("").alias("best"),
        F.lit(0).cast("long").alias("bestrun"),
    )

    def step(acc: Column, x: Column) -> Column:
        newrun = (
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.when(newrun > acc["bestrun"], x).otherwise(acc["best"]).alias("best"),
            F.greatest(newrun, acc["bestrun"]).alias("bestrun"),
        )

    def over(a: Column) -> Column:
        return F.struct(
            F.size(a).cast("long").alias("n_grams"),
            F.size(F.array_distinct(a)).cast("long").alias("n_distinct"),
            F.aggregate(a, zero, step).alias("agg"),
        )

    stats = df.select(
        F.col(id_col),
        F.length(normalized_text(F.col(text_col))).alias("__len"),
        F.transform(
            F.array(F.array_sort(shingles(F.col(text_col), n))), over
        )[0].alias("__s"),
    )
    top_gram = F.col("__s.agg.best")
    top_count = F.col("__s.agg.bestrun")
    return stats.select(
        id_col,
        F.col("__s.n_grams").alias("n_grams"),
        F.col("__s.n_distinct").alias("n_distinct"),
        top_gram.alias("top_gram"),
        top_count.alias("top_count"),
        (
            (F.col("__s.n_grams") - F.col("__s.n_distinct")).cast("double")
            / F.col("__s.n_grams").cast("double")
        ).alias("dup_frac"),
        F.when(F.col("__len") == 0, F.lit(0.0))
        .otherwise(
            (F.length(top_gram) * top_count).cast("double")
            / F.col("__len").cast("double")
        )
        .alias("top_char_frac"),
    )


def ngram_contamination(
    train_df: "DataFrame",
    eval_df: "DataFrame",
    id_col: str,
    text_col: str,
    n: int = 4,
    broadcast_eval: bool = True,
) -> "DataFrame":
    """Benchmark decontamination: count, per training doc, the distinct
    word ``n``-grams it shares with ANY document of ``eval_df`` — docs
    with ``n_shared > 0`` are contamination candidates to drop.

    The eval side collapses to its distinct n-gram set (benchmarks are
    tiny next to a corpus) and is broadcast by default, so the check is
    a map-side hash semi-join over the corpus — no corpus shuffle.  Set
    ``broadcast_eval=False`` for a shuffled join if the eval n-gram set
    is itself huge.
    """
    from jibaro_spark.operators.dedup import shingles

    ev = (
        eval_df.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("gram")
        )
        .distinct()
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    tr = train_df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("gram"),
    )
    return (
        tr.join(ev, "gram")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(F.col("__id").alias(id_col), "n_shared")
    )


def chunk_documents(
    df: "DataFrame",
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    stride: int = 24,
) -> "DataFrame":
    """Split each document into overlapping token windows (training
    context chunks): chunk ``i`` covers tokens ``[i·stride, i·stride +
    chunk_tokens)``; the last chunk may be short.  ``stride <
    chunk_tokens`` gives overlap.

    Native ``sequence``→``transform``→``explode`` — one generator per
    row, no shuffle; chunk rows inherit the parent's partitioning.
    Returns ``(id, chunk_id, n_tokens, chunk_text)``; hash
    ``chunk_text`` (or drop it) downstream if only fingerprints are
    needed.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def over(toks: Column) -> Column:
        n_chunks = F.floor((F.size(toks) - 1) / F.lit(stride)) + 1
        # sequence(0, stop) generates DESCENDING [0, -1] when stop < 0,
        # which a zero-token array would hit (two spurious chunks vs the
        # oracle's empty generate_series): clamp the stop AND gate on a
        # non-empty token array so empty docs yield zero chunks.
        # Unreachable via split() today (it never returns []), but
        # load-bearing if tokens() ever filters empty strings (ADVICE r2).
        seq = F.when(
            F.size(toks) > 0,
            F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            seq,
            lambda i: F.struct(
                i.cast("long").alias("chunk_id"),
                F.array_join(
                    F.slice(toks, i * stride + 1, chunk_tokens), " "
                ).alias("chunk_text"),
            ),
        )

    chunks = df.select(
        F.col(id_col),
        F.explode(
            F.transform(F.array(tokens(F.col(text_col))), over)[0]
        ).alias("__c"),
    )
    return chunks.select(
        id_col,
        F.col("__c.chunk_id").alias("chunk_id"),
        F.size(F.split(F.col("__c.chunk_text"), " ")).cast("long").alias("n_tokens"),
        F.col("__c.chunk_text").alias("chunk_text"),
    )


#: PII scrub patterns, applied in this order (email first: its local
#: part could otherwise be nibbled by the phone pattern).  Written in
#: the common subset of Java regex (Spark) and RE2 (DuckDB): no
#: backreferences, no lookaround — so the scrub is oracle-checkable
#: cross-engine and, at 100 TB, runs entirely inside whole-stage
#: codegen (regexp_replace/regexp_count are JVM-native; no Python).
#:
#: Reference parity note: the reference engine has no PII pass; this is
#: part of the BASELINE.json [ext] training-pipeline mandate.
#: The email quantifiers are CAPPED at the RFC limits (64-char local
#: part, RFC 5321; 253-char domain, 63-char TLD label, RFC 1035) — not
#: for validity but for scan cost: with an unbounded ``[class]+`` the
#: matcher re-scans the remaining run from every start position, O(n²)
#: over a long PII-class run (the bigval fixture's 100k-char unbroken
#: token took the scrub from 0.6 s to 472 s).  A cap bounds every
#: attempt at ~380 chars, restoring O(n·cap).  RFC-valid emails match
#: identically; only locals/domains beyond the RFC limits change (the
#: redaction then covers the trailing in-limit slice).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]{1,253}\.[A-Za-z]{2,63}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-kind PII match counts (``{kind: Column<long>}``), computed on
    the RAW text (before :func:`redact_pii` rewrites it)."""
    return {
        kind: F.regexp_count(col, F.lit(pat)).cast("long")
        for kind, pat, _ in PII_PATTERNS
    }


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its placeholder token, in
    :data:`PII_PATTERNS` order.  Replacement tokens contain no digits,
    dots or ``@``, so earlier rewrites cannot create later matches."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def tfidf_cosine_pairs(
    docs: "DataFrame",
    id_col: str,
    text_col: str,
    group_col: str | None = None,
    min_cosine: float = 0.2,
    max_df: int | None = None,
    round_decimals: int = 6,
) -> "DataFrame":
    """All-pairs SPARSE cosine similarity over TF-IDF term vectors via
    a term-at-a-time inverted index ([ext]; the classic all-pairs
    similarity-search shape, cf. Bayardo et al. WWW'07) — the sparse
    sibling of the dense-embedding kernels in
    :mod:`jibaro_spark.operators.similarity`.

    Per-term partial products flow through the term-keyed equi-join
    (never an all-pairs cross join); candidate volume is Σ_t df_t² —
    bound it with ``group_col`` (pairs only within a group) and/or
    ``max_df`` (the standard df-cut: drop ultra-common terms from the
    vectors; they carry ≈0 TF-IDF weight anyway, and at web scale
    they are exactly the terms whose df² explodes).

    Cross-engine determinism: weights are ``tf · ln(N/df)`` on exact
    integer counts, every float SUM (dot products, norms) runs as
    round-then-DECIMAL — order-free, so a SQL engine replays the
    cosine bit-for-bit.  Returns ``(id_a, id_b, cosine)`` with
    ``id_a < id_b`` and ``cosine ≥ min_cosine``.
    """
    from pyspark.sql import functions as F

    from jibaro_spark.operators.util import dense_exchange, ensure_parallelism

    grp = [group_col] if group_col else []
    # r12 (guide §2.5): the fixture tables are single-row-group files,
    # so tokenization + TF aggregation ran map-side on ONE core
    # (decomposed 3.7 s of the eager checkpoint job at sf0.1);
    # deterministic hash spread on the id before the explode.
    base = ensure_parallelism(
        docs.select(F.col(id_col).alias("__id"), *grp, F.col(text_col).alias("__tx")),
        by="__id",
    )
    toks = base.select("__id", *grp, F.explode(tokens(F.col("__tx"))).alias("__t"))
    tf = toks.groupBy("__id", *grp, "__t").agg(
        F.count(F.lit(1)).cast("long").alias("__tf")
    )
    dfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("long").alias("__df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_df)
    # corpus size stays IN-PLAN as a 1-row broadcast instead of a
    # construction-time .count() job (r12: the count re-scanned docs
    # for 1.5 s before the real job even started); distinct-then-count
    # keeps the exact distinct().count() semantics (a NULL id counts).
    nd = docs.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__nd")
    )
    w = (
        tf.join(dfreq, "__t")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "__w",
            F.col("__tf").cast("double")
            * F.log(F.col("__nd") / F.col("__df").cast("double")),
        )
        .drop("__nd")
        .localCheckpoint(eager=True)  # weights feed norms AND the pair join
    )
    dec = "decimal(28,10)"
    norms = w.groupBy("__id").agg(
        F.sqrt(
            F.sum(F.round(F.col("__w") * F.col("__w"), 8).cast(dec)).cast("double")
        ).alias("__n")
    )
    a = w.select(
        F.col("__id").alias("id_a"), *[F.col(g).alias(f"__ga_{g}") for g in grp],
        "__t", F.col("__w").alias("__wa"),
    )
    b = w.select(
        F.col("__id").alias("id_b"), *[F.col(g).alias(f"__gb_{g}") for g in grp],
        "__t", F.col("__w").alias("__wb"),
    )
    cond = [a["__t"] == b["__t"]] + [
        a[f"__ga_{g}"] == b[f"__gb_{g}"] for g in grp
    ]
    # r12 (guide §2.2): the checkpointed weights are a few MB, so AQE
    # coalesced the pair join to 1-2 tasks while the Σ_t df_t² partial
    # products (22.5M at sf0.1) are pure CPU — 25 of the operator's
    # 30 s on one core.  The explicit keyed exchange is the same one
    # the join needs, at full parallelism; posting lists are df-bounded
    # (and ``max_df``-cut when set), so skew is bounded by construction.
    a = dense_exchange(a, "__t", *[f"__ga_{g}" for g in grp])
    dots = (
        a.join(b, cond)
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.round(F.col("__wa") * F.col("__wb"), 8).cast(dec))
            .cast("double")
            .alias("__dot")
        )
    )
    na = norms.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = norms.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("__dot") / (F.col("__na") * F.col("__nb")), round_decimals
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
