"""LLM-data-pipeline declared queries ([ext] — the north-star operator
set: dedup, similarity search, text analysis, multimodal plumbing).

SQL-expressible variants carry DuckDB oracles; the LSH-based
approximate ops are declared rows-only (non-SQL-expressible) and are
instead verified in pytest against their exact counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.operators import dedup as dd
from jibaro_spark.operators import similarity as sim
from jibaro_spark.operators import textops as tx
from jibaro_spark.queries.registry import declare, load_tables

# Normalized text in DuckDB SQL (mirrors textops.normalized_text; the
# 'g' flag matches Spark's replace-all semantics).
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS = f"string_split({_NORM}, ' ')"


def _zipgrams(lst: str, k: int, joiner: str = "' '") -> str:
    """O(n) DuckDB word-``k``-gram fragment (bigval class, r11).

    The previous oracle idiom — ``list_transform(range(1, C + 1), i ->
    array_to_string(lst[i:i+{k-1}], ' '))`` with ``C = greatest(len - (k-1),
    1)`` — evaluates a list SLICE per position, which DuckDB executes in
    O(position) (measured: 99.6 s for one 50k-token list, quadratic), so
    the bigval fixture's 250k-token document turned every shingle oracle
    into hours of single-threaded scaffolding.  ``list_zip`` of the k
    shifted views is one O(k·n) pass (0.057 s on the same list) and is
    bit-identical: trailing positions zip NULL padding, which
    ``array_to_string`` skips — exactly the old form's end-clamped short
    grams — and the CASE reproduces the old form's single-NULL gram for
    NULL/empty token lists (``greatest(NULL, 1) = 1`` made the old range
    yield one NULL gram there).  Single-ELEMENT lambda access is O(1)
    (measured); only slices carried the quadratic cost.

    CALLER CONTRACT (ADVICE r11 #4): ``lst`` is interpolated TEXTUALLY
    into k shifted views plus the len()/CASE sites — pass a
    pre-materialized list COLUMN (bind tokenization in a ``tk``/
    ``toks`` CTE first, as the shingle call sites do), never a complex
    expression like ``_TOKS`` directly, or the tokenizer chain is
    inlined 5+ times and only DuckDB's CSE stands between you and
    re-tokenizing every document per shifted view.
    """
    shifted = ", ".join([lst] + [f"({lst})[{j}:]" for j in range(2, k + 1)])
    fields = ", ".join(f"x[{j}]" for j in range(1, k + 1))
    return (
        f"CASE WHEN {lst} IS NULL OR len({lst}) = 0 "
        f"THEN [CAST(NULL AS VARCHAR)] "
        f"ELSE list_transform(list_zip({shifted})"
        f"[1:greatest(len({lst}) - {k - 1}, 1)], "
        f"x -> array_to_string([{fields}], {joiner})) END"
    )


QTOK_ORACLE = f"""
SELECT doc_id,
       len({_TOKS}) AS n_tokens,
       (CAST(LENGTH(text) AS DOUBLE) - (CAST(len({_TOKS}) AS DOUBLE) - 1)) / CAST(len({_TOKS}) AS DOUBLE) AS avg_token_len,
       CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / CAST(LENGTH(text) AS DOUBLE) AS alpha_ratio,
       CAST(len(list_distinct({_TOKS})) AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE) AS uniq_token_ratio
FROM documents
ORDER BY doc_id
"""


@declare("q_text_token_stats", oracle=QTOK_ORACLE, description="token counting + quality features, native exprs (U5 [ext] text analysis)")
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    feats = tx.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        feats["uniq_token_ratio"].alias("uniq_token_ratio"),
    ).orderBy("doc_id")


def _hits_sql(lang_words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in lang_words) + "]"
    return f"len(list_intersect(list_distinct({_TOKS}), {arr}))"


QLANG_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang,
         {_hits_sql(tx.STOPWORDS['en'])} AS c_en,
         {_hits_sql(tx.STOPWORDS['es'])} AS c_es,
         {_hits_sql(tx.STOPWORDS['de'])} AS c_de,
         {_hits_sql(tx.STOPWORDS['fr'])} AS c_fr
  FROM documents
)
SELECT doc_id, labeled_lang,
       CASE WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
            WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
            WHEN c_de >= c_fr THEN 'de'
            ELSE 'fr' END AS detected_lang,
       CAST(c_en AS BIGINT) AS en_hits
FROM scored
ORDER BY doc_id
"""


@declare("q_text_language_id", oracle=QLANG_ORACLE, description="heuristic stopword-vote language ID (text analysis [ext])")
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # en_hits is the varying evidence column (fixture text is word-soup
    # whose stopwords are English-only, so detected_lang is uniformly
    # 'en' — the vote COUNTS are what the oracle can meaningfully check)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.language_id(F.col("text")).alias("detected_lang"),
        tx.stopword_hits(F.col("text"), "en").cast("long").alias("en_hits"),
    ).orderBy("doc_id")


QFP_ORACLE = f"""
SELECT doc_id, md5({_NORM}) AS fingerprint
FROM documents
ORDER BY doc_id
"""


@declare("q_text_fingerprint", oracle=QFP_ORACLE, description="md5 content fingerprint of normalized text (text analysis [ext])")
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id", tx.fingerprint_md5(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


# Exact dedup: kept ids are hash-function-independent (min doc_id per
# distinct normalized content), so the oracle needs no xxhash64.
QDEDUP_ORACLE = f"""
SELECT doc_id FROM (
  SELECT doc_id,
         ROW_NUMBER() OVER (PARTITION BY {_NORM} ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
ORDER BY doc_id
"""


@declare("q_dedup_exact_docs", oracle=QDEDUP_ORACLE, description="exact dedup via content hash groupBy (dedup [ext])")
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        dd.dedup_exact(docs, content_cols=["text"], keep_order_col="doc_id")
        .select("doc_id")
        .orderBy("doc_id")
    )


QNORM_ORACLE = """
SELECT vec_id,
       ROUND(SQRT(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
             list_transform(generate_series(1, len(embedding)),
                            i -> CASE WHEN i % 2 = 1 THEN 1.0 ELSE -1.0 END)), 6) AS dot_alt,
       label
FROM embeddings
WHERE embedding IS NOT NULL
ORDER BY vec_id
"""


@declare("q_embedding_norms", oracle=QNORM_ORACLE, description="vector L2 norms + alternating-sign dot via native array aggregate (J6 support)")
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-embedding rows have no norms on either side (NULL-fuzz sweep)
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].filter(
        F.col("embedding").isNotNull()
    )
    # l2_norm is uniformly 1.0 (fixture vectors are unit-normalized —
    # itself a verified property); dot_alt VARIES per vector, so the
    # hash check exercises real dot-product values too.
    alt = F.transform(
        F.sequence(F.lit(1), F.size(F.col("embedding"))),
        lambda i: F.when(i % 2 == 1, F.lit(1.0)).otherwise(F.lit(-1.0)),
    )
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sim.l2_norm_sq(F.col("embedding"))), 6).alias("l2_norm"),
        F.round(sim.dot(F.col("embedding"), alt), 6).alias("dot_alt"),
        "label",
    ).orderBy("vec_id")


QKNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
  FROM embeddings WHERE vec_id % 100 = 0
), pairs AS (
  SELECT q.q_id, e.vec_id,
         ROUND(list_dot_product(q.q_vec, CAST(e.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(q.q_vec, q.q_vec))
                  * SQRT(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))), 6)
           AS cosine_sim
  FROM q, embeddings e
  WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id, cosine_sim,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM pairs
)
SELECT q_id, vec_id, cosine_sim, rank
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""


@declare("q_knn_bruteforce", oracle=QKNN_ORACLE, description="exact cosine top-k (brute force baseline, J6 [ext])")
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return sim.knn_bruteforce(
        queries, emb, "q_id", "q_vec", "vec_id", "embedding", k=5
    ).select("q_id", "vec_id", "cosine_sim", "rank").orderBy("q_id", "rank")


# ---- rows-only declared queries (non-SQL-expressible; verified in
# pytest against exact counterparts) ------------------------------------


@declare("q_knn_lsh", oracle=None, description="approximate cosine top-k via banded sign-LSH + exact re-rank (J6 scale path)")
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return sim.knn_lsh(
        queries, emb, "q_id", "q_vec", "vec_id", "embedding",
        k=5, dim=64, num_planes=16, bands=4,
    ).select("q_id", "vec_id", "cosine_sim", "rank").orderBy("q_id", "rank")


@declare(
    "q_knn_ivf",
    oracle=None,
    description="approximate cosine top-k via IVF-Flat cells + exact re-rank (J6 scale path; recall pinned in tests)",
)
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.util import ensure_parallelism

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # r12 (guide §2.5): one deterministic spread ahead of the Lloyd
    # assignment + IVF cell maps, which otherwise run their k×dim
    # nearest-cell expressions on the single-row-group scan's one
    # core (same treatment as q_knn_ivfpq; recall-pinned family).
    emb = ensure_parallelism(emb, by="vec_id").localCheckpoint(eager=False)
    # (lazy pin: the training phases are SEPARATE collect jobs — seed,
    #  Lloyd means, PQ codebook — and shuffle output is not reused
    #  across jobs, so without the pin each job re-ran scan+exchange)
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents = sim.seed_centroids(emb, "vec_id", "embedding", n_centroids=8)
    cents = sim.kmeans_refine(emb, "embedding", cents, iterations=1)
    return (
        sim.knn_ivf(
            queries, emb, "q_id", "q_vec", "vec_id", "embedding",
            k=5, centroids=cents, n_probe=3,
        )
        .select("q_id", "vec_id", "cosine_sim", "rank")
        .orderBy("q_id", "rank")
    )


# Element-wise centroid per label: the distributed form of "mean
# embedding per cluster" — posexplode shuffles (label, pos) keys, so
# the reduction parallelizes over dimensions × groups rather than
# collecting vectors.  Cross-row determinism: elements are rounded to
# 6 dp FIRST (engine-agnostic — a rounding tie would need the double
# to be an exact 7-digit decimal, which no binary fraction is), then
# cast to decimal(18,6) exactly, so the sum is order-independent and
# bit-identical to DuckDB.
QCENT_ORACLE = """
WITH e AS (
  SELECT label, unnest(embedding) AS val,
         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos
  FROM embeddings
)
SELECT label, pos,
       CAST(SUM(CAST(ROUND(CAST(val AS DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_val
FROM e GROUP BY label, pos ORDER BY label, pos
"""


@declare(
    "q_embedding_centroid",
    oracle=QCENT_ORACLE,
    description="element-wise centroid per label via posexplode + two-key agg (J6 support, clustering building block)",
)
def q_embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(
                    F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)")
                ).cast("double")
                / F.count("val")
            ).alias("mean_val")
        )
        .orderBy("label", "pos")
    )


@declare("q_minhash_near_dup", oracle=None, description="MinHash+LSH near-duplicate pairs (dedup scale path [ext])")
def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return dd.minhash_near_duplicates(
        docs, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.4
    ).orderBy("id_a", "id_b")


@declare("q_simhash_near_dup", oracle=None, description="SimHash near-duplicate pairs via 16-bit block LSH (dedup [ext])")
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return dd.simhash_near_duplicates(
        docs, "doc_id", "text", max_hamming=8
    ).orderBy("id_a", "id_b")


# Exact math → full oracle: DuckDB builds the same 3-gram shingle sets
# with a list comprehension (slice clamping matches Spark's slice()).
QNGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS} AS words FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct({_zipgrams('words', 3)}) AS s
  FROM toks
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), sz AS (
  SELECT doc_id, len(s) AS n FROM sh
)
SELECT id_a, id_b, jaccard FROM (
  SELECT c.id_a, c.id_b,
         CAST(c.inter AS DOUBLE)
           / CAST(sa.n + sb.n - c.inter AS DOUBLE) AS jaccard
  FROM cand c
  JOIN sz sa ON sa.doc_id = c.id_a
  JOIN sz sb ON sb.doc_id = c.id_b
) WHERE jaccard >= 0.3
ORDER BY id_a, id_b
"""


@declare("q_ngram_jaccard_pairs", oracle=QNGRAM_ORACLE, description="exact n-gram Jaccard over inverted-index candidates (dedup [ext])")
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text has no shingles: without the filter its ''-shingle would
    # pair it with genuinely-empty docs (NULL-fuzz sweep)
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    return dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.3
    ).orderBy("id_a", "id_b")


# Fixture max pairwise cosine is ~0.6 — below the LSH regime, so the
# declared query uses the exact block-matmul path (which also makes it
# oracle-checkable); the LSH variant is exercised in tests at its
# high-threshold design point.
QEMBDUP_ORACLE = """
WITH base AS (
  -- a vector with a NaN/Inf component is not a valid embedding (float
  -- fuzz sweep): its NaN cosine passes DuckDB's NaN-largest >= filter
  -- but fails numpy's; a NULL component likewise invalidates the
  -- vector (NULL contract: Spark's ~exists fence yields NULL under
  -- three-valued logic and drops it, so the lambda must be NULL-aware)
  SELECT * FROM embeddings
  WHERE len(list_filter(embedding, x -> x IS NULL OR NOT isfinite(x))) = 0
)
SELECT id_a, id_b, cosine_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)
           AS cosine_sim
  FROM base a, base b
  WHERE a.vec_id < b.vec_id
)
WHERE cosine_sim >= 0.5
ORDER BY id_a, id_b
"""


@declare(
    "q_embedding_near_dup",
    oracle=QEMBDUP_ORACLE,
    description="embedding-cosine near-dup pairs, exact block-matmul mapInPandas (dedup [ext])",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # finite-vector fence, mirrored in the oracle (float fuzz sweep)
    emb = emb.filter(
        ~F.exists(
            "embedding",
            lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))),
        )
    )
    return sim.embedding_near_duplicates_exact(
        emb, "vec_id", "embedding", threshold=0.5
    ).orderBy("id_a", "id_b")


QQUAL_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS DOUBLE) AS n_char,
         CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
         CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
         CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_uniq
  FROM documents
)
SELECT doc_id,
       ROUND(n_alpha / n_char * 0.5
             + n_uniq / n_tok * 0.4
             + (1.0 - n_punct / n_char) * 0.1, 6) AS quality
FROM f
ORDER BY doc_id
"""


@declare(
    "q_text_quality_score",
    oracle=QQUAL_ORACLE,
    description="composite text quality score, native exprs (text analysis [ext])",
)
def q_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id", F.round(tx.quality_score(F.col("text")), 6).alias("quality")
    ).orderBy("doc_id")


QBPE_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '([a-z]{{1,4}}|[0-9]|[^a-z0-9\\s])', 1)) AS n_bpe_tokens,
       -- empty/whitespace text has ZERO tokens (split('') yields ['']
       -- in SQL — mirror the Spark token_count contract)
       CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS n_ws_tokens
FROM documents
ORDER BY doc_id
"""


@declare(
    "q_bpe_token_count",
    oracle=QBPE_ORACLE,
    description="BPE-ish subword token estimate vs whitespace tokens (token counting [ext])",
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        tx.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        tx.token_count(F.col("text")).alias("n_ws_tokens"),
    ).orderBy("doc_id")


QROLLFP_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents WHERE text IS NOT NULL
), cs AS (
  -- char array once; the old per-i substring(t, i+1, 8) seeks code
  -- points from the string start = O(len²) per doc (bigval class)
  SELECT doc_id, string_split(t, '') AS c FROM norm
), sk AS (
  SELECT doc_id,
         list_slice(list_sort(list_distinct(list_transform(
           {_zipgrams('c', 8, "''")},
           g -> md5(g)))), 1, 4) AS fp
  FROM cs
)
SELECT doc_id,
       CAST(len(fp) AS BIGINT)  AS n_hashes,
       fp[1]                    AS fp_min,
       fp[len(fp)]              AS fp_max,
       array_to_string(fp, ',') AS fp_sig
FROM sk
ORDER BY doc_id
"""


@declare(
    "q_rolling_fingerprint",
    oracle=QROLLFP_ORACLE,
    description="winnowing rolling-hash document sketch (md5 k-gram mode — cross-engine verifiable; xxhash64 fast path in tests)",
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL text sketches to nothing — dropped on both sides
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    # Scalar projection of the sketch (the driver's canonicalizer can't
    # sort array cells); the array itself is covered in test_units.
    # md5 hasher: hex-string k-gram hashes DuckDB reproduces
    # bit-identically (the xxhash64 fast path has no DuckDB equivalent
    # and stays exact-tested in pytest).
    # r12 (guide §2.5): the per-doc bottom-k fold over every k-gram md5
    # ran on the single-row-group scan's ONE core (8.7 s at sf0.1) —
    # spread before the sketch map.
    from jibaro_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(docs.select("doc_id", "text"), by="doc_id")
    fp = F.col("fingerprint")
    return (
        docs.select(
            "doc_id",
            tx.rolling_hash_fingerprint(F.col("text"), hasher="md5").alias(
                "fingerprint"
            ),
        )
        .select(
            "doc_id",
            F.size(fp).cast("long").alias("n_hashes"),
            F.get(fp, 0).alias("fp_min"),
            F.get(fp, F.size(fp) - 1).alias("fp_max"),
            F.concat_ws(",", fp).alias("fp_sig"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs → connected components → cluster ids.
# The oracle recomputes the exact n-gram pairs (QNGRAM_ORACLE's CTEs —
# inverted-index candidates, jaccard = inter/(|A|+|B|-inter) over
# distinct shingle sets, identical doubles to the list_intersect
# all-pairs form but ~20x faster at fixture scale) and closes them
# transitively with a recursive CTE — an independent formulation of the
# same graph semantics the alternating-star operator computes in
# O(log n) distributed rounds.
QCLUSTER_ORACLE = f"""
WITH RECURSIVE fp AS (
  -- exact-duplicate collapse FIRST (skew class r10): the candidate/
  -- verify/closure stages run once per DISTINCT normalized text;
  -- members inherit their representative's cluster (rep = group min
  -- doc_id, so component minima are unchanged)
  SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS f
  FROM documents WHERE text IS NOT NULL
), grp AS (
  SELECT f, MIN(doc_id) AS rep FROM fp GROUP BY f
), toks AS (
  SELECT d.doc_id, {_TOKS} AS words
  FROM documents d JOIN grp g ON g.rep = d.doc_id
), sh AS (
  SELECT doc_id,
         list_distinct({_zipgrams('words', 3)}) AS s
  FROM toks
), ex AS (
  SELECT doc_id, unnest(s) AS g FROM sh
), cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), sz AS (
  SELECT doc_id, len(s) AS n FROM sh
), pr AS (
  SELECT id_a, id_b FROM (
    SELECT c.id_a, c.id_b,
           CAST(c.inter AS DOUBLE)
             / CAST(sa.n + sb.n - c.inter AS DOUBLE) AS jaccard
    FROM cand c
    JOIN sz sa ON sa.doc_id = c.id_a
    JOIN sz sb ON sb.doc_id = c.id_b
  ) WHERE jaccard >= 0.3
), edges AS (
  SELECT id_a AS a, id_b AS b FROM pr
  UNION
  SELECT id_b AS a, id_a AS b FROM pr
), reach(src, dst) AS (
  SELECT a, a FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
), comp AS (
  SELECT src AS did, MIN(dst) AS cid FROM reach GROUP BY src
), mapped AS (
  SELECT d.doc_id, COALESCE(c.cid, g.rep, d.doc_id) AS cluster_id
  FROM documents d
  LEFT JOIN fp ON fp.doc_id = d.doc_id
  LEFT JOIN grp g ON g.f = fp.f
  LEFT JOIN comp c ON g.rep = c.did
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM mapped
ORDER BY doc_id
"""


@declare(
    "q_dedup_clusters",
    oracle=QCLUSTER_ORACLE,
    description="near-dup pairs → connected components (alternating large/small-star) → canonical cluster ids (dedup [ext])",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from jibaro_spark.operators.graph import dedup_clusters

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # the cluster UNIVERSE keeps every doc (NULL-text docs are
    # singletons), but pair generation is over text-bearing docs only:
    # a NULL text's ''-shingle must not link it to empty docs.
    # Exact duplicates collapse FIRST (skew class r10, mirrored in the
    # oracle): the pair machinery and connected components run per
    # DISTINCT normalized text; members inherit their representative's
    # cluster (rep = group min doc_id, so cluster ids are unchanged) —
    # a text at 50% of the corpus otherwise floods CC with O(copies²)
    # pair edges.
    from jibaro_spark.operators.dedup import _exact_text_collapse

    reps, members = _exact_text_collapse(
        docs.filter(F.col("text").isNotNull()), "doc_id", "text"
    )
    pairs = dd.ngram_jaccard_pairs(
        reps, "doc_id", "text", shingle_n=3, threshold=0.3
    )
    rep_clusters = dedup_clusters(
        reps.select("doc_id"), pairs.select("id_a", "id_b"), "doc_id"
    )
    if members is None:  # adaptive collapse: every doc is its own rep
        mapping = reps.select("doc_id", F.col("doc_id").alias("__r"))
    else:
        mapping = members.select(
            F.col("__gid").alias("doc_id"), F.col("__rep").alias("__r")
        )
    clustered = (
        docs.select("doc_id")
        .join(mapping, "doc_id", "left")
        .join(
            rep_clusters.select(F.col("doc_id").alias("__r"), "cluster_id"),
            "__r",
            "left",
        )
        .withColumn("cluster_id", F.coalesce("cluster_id", "__r", "doc_id"))
        .drop("__r")
    )
    return (
        clustered.withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .select("doc_id", "cluster_id", "cluster_size")
        .orderBy("doc_id")
    )


# TF-IDF top terms per document.  Ranking is by (tf DESC, df ASC, term
# ASC) — integer keys only, so the top-3 choice is engine-independent;
# the float tfidf value is reported (rounded) but never ranked on.
QTFIDF_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE len(term) > 0
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * LN((CAST(nd.n_docs AS DOUBLE) + 1.0) / (CAST(dfreq.df AS DOUBLE) + 1.0)), 6) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rn
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, df, tfidf, rn FROM ranked
WHERE rn <= 3
ORDER BY doc_id, rn
"""


@declare(
    "q_tfidf_top_terms",
    oracle=QTFIDF_ORACLE,
    description="TF-IDF top-3 terms per document, integer-keyed ranking (text analysis [ext])",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                ),
                6,
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


# Exact heavy hitters: global term frequencies, two-level hash
# aggregate (partial map-side combine after the explode keeps the
# shuffle at |distinct terms|, not |tokens|).
QHH_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT term, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
  FROM toks WHERE len(term) > 0 GROUP BY term
)
SELECT term, n_occurrences, n_docs FROM tf
ORDER BY n_occurrences DESC, term ASC
LIMIT 50
"""


@declare(
    "q_heavy_hitter_terms",
    oracle=QHH_ORACLE,
    description="exact top-50 heavy-hitter terms (occurrences + doc frequency; text analysis [ext])",
)
def q_heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
        .limit(50)
    )


# Deterministic train/validation/test split: bucket on the first hex
# nibble of md5(doc_id) — reproducible across engines, machines and
# partitionings (the property a 100 TB training pipeline needs: the
# split of any given document never depends on what else is in the
# batch).  0-b → train (12/16), c-d → valid (2/16), e-f → test (2/16).
QSPLIT_ORACLE = """
WITH assigned AS (
  SELECT lang,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'e' THEN 'test'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'c' THEN 'valid'
              ELSE 'train' END AS split,
         n_chars
  FROM documents
)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / COUNT(n_chars) AS avg_chars
FROM assigned
GROUP BY split, lang
ORDER BY split, lang
"""


@declare(
    "q_train_test_split",
    oracle=QSPLIT_ORACLE,
    description="deterministic md5-bucket train/valid/test split, per-language counts (training pipeline [ext])",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.queries.registry import davg

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib >= "e", "test").when(nib >= "c", "valid").otherwise("train")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg("n_chars", "avg_chars", scale=2),
        )
        .orderBy("split", "lang")
    )


# Sequence packing: assign docs to fixed-token-budget training
# sequences by contiguous doc_id order.  The running total comes from
# the two-level distributed prefix sum (no global window); the oracle
# is the plain single-window SQL the operator must be row-identical to.
QPACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0 ELSE len({_TOKS}) END AS n_tokens
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
), c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / 512.0) AS BIGINT) AS seq_id
FROM c
ORDER BY doc_id
"""


@declare(
    "q_sequence_packing",
    oracle=QPACK_ORACLE,
    description="fixed-budget training-sequence packing via distributed two-level prefix sum (training pipeline [ext])",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.relational import partitioned_prefix_sum

    # packing order is doc_id — a NULL id has no position in it, and a
    # NULL text has no token count; both are out of the packing frame
    # on both sides (greedy packing is order-sensitive, so ONE stray
    # row would shift every later sequence id)
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    toks = docs.select(
        "doc_id", tx.token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    cum = partitioned_prefix_sum(
        toks, "doc_id", "n_tokens", out_col="cum_tokens", chunk_width=64
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(512.0)).alias(
            "seq_id"
        ),
    ).orderBy("doc_id")


# Vocabulary building: contiguous token ids by (global frequency desc,
# term asc).  Counts shrink corpus → vocab before any ordering; the
# rank window runs over the top-k survivors only.
QVOCAB_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT term, COUNT(*) AS freq FROM toks WHERE len(term) > 0 GROUP BY term
), top AS (
  SELECT term, freq FROM tf ORDER BY freq DESC, term ASC LIMIT 100
)
SELECT term, freq,
       ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) - 1 AS token_id
FROM top
ORDER BY token_id
"""


@declare(
    "q_vocab_ids",
    oracle=QVOCAB_ORACLE,
    description="vocabulary construction: contiguous token ids by global frequency (training pipeline [ext])",
)
def q_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    tf = (
        docs.select(F.explode(tx.tokens(F.col("text"))).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = tf.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(100)
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    return (
        top.withColumn("token_id", F.row_number().over(w) - 1)
        .select("term", "freq", "token_id")
        .orderBy("token_id")
    )


# Exact deterministic stratified sample: n-per-stratum chosen by
# md5(doc_id) order — reproducible across engines/partitionings, no
# RNG (sampleBy is approximate AND seed-implementation-dependent).
QSTRAT_ORACLE = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= 5
ORDER BY lang, doc_id
"""


@declare(
    "q_stratified_sample",
    oracle=QSTRAT_ORACLE,
    description="exact deterministic stratified sample (5 per language, md5 order; training pipeline [ext])",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    )


# Gopher-style repetition signals: duplicate-bigram fraction and
# top-bigram character coverage — the "rep-ngram" boilerplate filters.
# Oracle mirrors dedup.shingles exactly (clamped 1-shingle short docs).
QREP_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_NORM} AS nt, {_TOKS} AS w FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
), g AS (
  SELECT doc_id, LENGTH(nt) AS len,
         unnest({_zipgrams('w', 2)}) AS gram
  FROM t
), c AS (
  SELECT doc_id, len, gram, COUNT(*) AS cnt FROM g GROUP BY 1,2,3
), s AS (
  SELECT doc_id, len, SUM(cnt) AS n_grams, COUNT(*) AS n_distinct FROM c GROUP BY 1,2
), top AS (
  SELECT doc_id, gram AS top_gram, cnt AS top_count
  FROM (SELECT doc_id, gram, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
        FROM c) WHERE rn = 1
)
SELECT s.doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       top_gram, CAST(top_count AS BIGINT) AS top_count,
       CAST(n_grams - n_distinct AS DOUBLE) / CAST(n_grams AS DOUBLE) AS dup_frac,
       CASE WHEN len = 0 THEN 0.0
            ELSE CAST(LENGTH(top_gram) * top_count AS DOUBLE) / CAST(len AS DOUBLE)
       END AS top_char_frac
FROM s JOIN top USING (doc_id)
ORDER BY s.doc_id
"""


@declare(
    "q_repetition_stats",
    oracle=QREP_ORACLE,
    description="Gopher-style duplicate/top-bigram repetition quality signals (training pipeline [ext])",
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repetition signals are per-identified-document over real text:
    # NULL ids (SQL joins drop them) and NULL text carry no signal
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    # r13 spread-at-the-map (the r12 signature-map pattern, guide
    # §2.5): repetition_stats is a zero-shuffle CPU-dense Project
    # (sort + run-length aggregate over every doc's gram array) that
    # otherwise runs entirely on the single-row-group scan's ONE core
    from jibaro_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(docs.select("doc_id", "text"), by="doc_id")
    return (
        tx.repetition_stats(docs, "doc_id", "text", n=2)
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "top_gram",
            F.col("top_count").cast("long").alias("top_count"),
            "dup_frac",
            "top_char_frac",
        )
        .orderBy("doc_id")
    )


# Benchmark decontamination: training docs sharing any word 4-gram with
# the "eval" subset (doc_id % 50 == 0 stands in for a benchmark set).
# The eval n-gram set is broadcast — map-side semi-join, no corpus
# shuffle before the per-doc count.
QDECON_ORACLE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS w FROM documents),
sh AS (
  SELECT doc_id,
         unnest(list_distinct({_zipgrams('w', 4)})) AS gram
  FROM t
),
ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 50 = 0)
SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM sh s JOIN ev USING (gram)
WHERE s.doc_id % 50 != 0
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


@declare(
    "q_decontaminate",
    oracle=QDECON_ORACLE,
    description="eval-set decontamination: 4-gram overlap vs broadcast benchmark n-grams (training pipeline [ext])",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    tr = docs.filter(F.col("doc_id") % 50 != 0)
    return (
        tx.ngram_contamination(tr, ev, "doc_id", "text", n=4)
        .select("doc_id", F.col("n_shared").cast("long").alias("n_shared"))
        .orderBy("doc_id")
    )


# Data-mixture report: per (source, lang) token shares and the
# resampling weight that would equalize token mass across groups —
# the bookkeeping behind mixture reweighting.  One grouped aggregate +
# a broadcast 1-row totals join; division order fixed for bit-identical
# doubles in both engines.
QMIX_ORACLE = f"""
WITH g AS (
  SELECT source, lang, COUNT(*) AS n_docs,
         CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
), t AS (
  SELECT CAST(SUM(n_tokens) AS DOUBLE) AS tot, CAST(COUNT(*) AS DOUBLE) AS ng FROM g
)
SELECT source, lang, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / tot AS token_share,
       (tot / ng) / CAST(n_tokens AS DOUBLE) AS resample_weight
FROM g, t
ORDER BY source, lang
"""


@declare(
    "q_source_mix",
    oracle=QMIX_ORACLE,
    description="data-mixture report: per (source, lang) token share + equalizing resample weight (training pipeline [ext])",
)
def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    g = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tx.tokens(F.col("text")))).alias("n_tokens"),
    )
    t = g.agg(
        F.sum("n_tokens").cast("double").alias("tot"),
        F.count(F.lit(1)).cast("double").alias("ng"),
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("tot")).alias("token_share"),
            ((F.col("tot") / F.col("ng")) / F.col("n_tokens").cast("double")).alias(
                "resample_weight"
            ),
        )
        .orderBy("source", "lang")
    )


# int8 embedding quantization: per-vector symmetric scale + quantized
# summaries.  Zero-shuffle array math; the array itself is exercised in
# pytest (reconstruction-error bound) — the driver compare gets the
# scalarized summaries.
QQUANT_ORACLE = """
WITH a AS (
  SELECT vec_id, embedding,
         COALESCE(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 0.0) AS amax
  FROM embeddings
  WHERE embedding IS NOT NULL
), q AS (
  SELECT vec_id, amax,
         CASE WHEN amax = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
              ELSE list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / (amax/127.0) + 0.5) AS BIGINT))
         END AS qv
  FROM a
)
SELECT vec_id, amax / 127.0 AS scale,
       CAST(list_sum(qv) AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS BIGINT) AS q_min,
       CAST(list_max(qv) AS BIGINT) AS q_max,
       CAST(len(list_filter(qv, q -> abs(q) = 127)) AS BIGINT) AS n_sat
FROM q
ORDER BY vec_id
"""


@declare(
    "q_quantize_int8",
    oracle=QQUANT_ORACLE,
    description="symmetric int8 embedding quantization summaries (ANN scale path [ext])",
)
def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL embeddings quantize to nothing on either side
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].filter(
        F.col("embedding").isNotNull()
    )
    return (
        sim.quantize_int8(emb, "vec_id", "embedding")
        .select(
            "vec_id",
            "scale",
            "q_sum",
            "q_min",
            "q_max",
            F.col("n_sat").cast("long").alias("n_sat"),
        )
        .orderBy("vec_id")
    )


# Composed end-to-end curation pipeline — the flagship: simulate a
# replayed ingest (10% of docs re-keyed as duplicates), then
# quality-filter → exact-dedup (must remove exactly the injected
# copies) → deterministic split → per-split/lang token accounting.
# Every stage is a covered operator; this query checks their
# COMPOSITION end-to-end against one SQL oracle.
QCURATE_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, lang FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents WHERE doc_id % 10 = 0
), f AS (
  SELECT doc_id, text, lang,
         CAST(LENGTH(text) AS DOUBLE) AS n_char,
         CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
         CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
         CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS n_punct,
         CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_uniq
  FROM base
), scored AS (
  SELECT doc_id, lang, n_tok,
         n_alpha / n_char * 0.5 + n_uniq / n_tok * 0.4 + (1.0 - n_punct / n_char) * 0.1 AS quality,
         {_NORM} AS norm
  FROM f
), kept AS (
  SELECT doc_id, lang, n_tok FROM (
    SELECT doc_id, lang, n_tok,
           ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
    FROM scored WHERE quality >= 0.68 AND n_tok >= 15
  ) WHERE rn = 1
), assigned AS (
  SELECT lang, n_tok,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'e' THEN 'test'
              WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= 'c' THEN 'valid'
              ELSE 'train' END AS split
  FROM kept
)
SELECT split, lang, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM assigned
GROUP BY split, lang
ORDER BY split, lang
"""


@declare(
    "q_curation_pipeline",
    oracle=QCURATE_ORACLE,
    description="composed curation pipeline: replay-dup injection → quality filter → exact dedup → split → token accounting (flagship [ext])",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    base = docs.select("doc_id", "text", "lang").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text", "lang"
        )
    )
    scored = base.select(
        "doc_id",
        "lang",
        "text",
        F.size(tx.tokens(F.col("text"))).cast("double").alias("n_tok"),
        tx.quality_score(F.col("text")).alias("quality"),
    ).filter((F.col("quality") >= 0.68) & (F.col("n_tok") >= 15))
    kept = dd.dedup_exact(scored, content_cols=["text"], keep_order_col="doc_id")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = F.when(nib >= "e", "test").when(nib >= "c", "valid").otherwise("train")
    return (
        kept.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .orderBy("split", "lang")
    )


# Overlapping token-window chunking (training context windows):
# chunk i = tokens [i*24, i*24+32).  Scalarized output: per-chunk token
# count + md5 fingerprint (the text column itself is for downstream
# use; the driver compare gets scalars).
QCHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
), tok AS (
  -- explode once; each token lands in at most ceil(32/24) = 2 chunks.
  -- The old per-chunk list_slice paid O(chunk_start) per slice —
  -- quadratic over the bigval fixture's 250k-token document.
  SELECT doc_id,
         unnest(w) AS tk,
         unnest(range(1, len(w)+1)) AS pos,
         CAST(floor(CAST(len(w)-1 AS DOUBLE)/24.0) AS BIGINT) AS max_chunk
  FROM t
), asg AS (
  -- token pos belongs to chunk i iff i*24+1 <= pos <= i*24+32
  SELECT doc_id, tk, pos,
         unnest(range(
           greatest(CAST(ceil(CAST(pos-32 AS DOUBLE)/24.0) AS BIGINT), 0),
           least(CAST(floor(CAST(pos-1 AS DOUBLE)/24.0) AS BIGINT), max_chunk) + 1
         )) AS chunk_id
  FROM tok
), c AS (
  SELECT doc_id, chunk_id, string_agg(tk, ' ' ORDER BY pos) AS chunk_text
  FROM asg GROUP BY doc_id, chunk_id
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens,
       md5(chunk_text) AS chunk_md5
FROM c
ORDER BY doc_id, chunk_id
"""


@declare(
    "q_chunk_documents",
    oracle=QCHUNK_ORACLE,
    description="overlapping token-window chunking for training contexts (training pipeline [ext])",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        tx.chunk_documents(docs, "doc_id", "text", chunk_tokens=32, stride=24)
        .select(
            "doc_id",
            "chunk_id",
            "n_tokens",
            F.md5(F.col("chunk_text")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


# Verifiable-mode MinHash: md5-hex slot minima (identical in DuckDB),
# whole signature oracle-checked — the cross-engine contract for the
# xxhash64 production signatures (estimator accuracy tested in pytest).
QMHSIG_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS} AS words FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT doc_id, list_distinct({_zipgrams('words', 3)}) AS sh FROM tk
), s AS (
  SELECT doc_id, i.range AS slot, min(md5(CAST(i.range AS VARCHAR) || '|' || u.g)) AS m
  FROM t, unnest(t.sh) AS u(g), range(0, 16) AS i
  GROUP BY doc_id, i.range
)
SELECT doc_id, md5(string_agg(m, ',' ORDER BY slot)) AS sig_md5
FROM s GROUP BY doc_id ORDER BY doc_id
"""


@declare(
    "q_minhash_signature",
    oracle=QMHSIG_ORACLE,
    description="MinHash signatures, md5 verifiable mode — slot-wise cross-engine equality (dedup [ext])",
)
def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.util import ensure_parallelism

    # a NULL text has no shingles hence no signature — on either side
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    # r12 (guide §2.5): 16 md5 slot minima over every shingle of every
    # doc is extreme CPU-per-row, and the single-row-group scan ran it
    # on ONE core (7.8 s at sf0.1) — spread before the signature map.
    docs = ensure_parallelism(docs.select("doc_id", "text"), by="doc_id")
    return docs.select(
        "doc_id", dd.minhash_signature_md5(F.col("text")).alias("sig_md5")
    ).orderBy("doc_id")


# Verifiable-mode SimHash: md5-nibble bit votes (identical in DuckDB) —
# the cross-engine contract for the xxhash64 production fingerprints.
QSIMSIG_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS} AS words FROM documents WHERE text IS NOT NULL
), t AS (
  SELECT doc_id, list_distinct({_zipgrams('words', 2)}) AS sh FROM tk
), b AS (
  SELECT doc_id, p.range AS pos,
         SUM(CASE WHEN (CAST(('0x' || substr(md5(u.g), CAST(p.range//4 AS BIGINT)+1, 1)) AS INTEGER)
                        >> CAST(3 - p.range%4 AS INTEGER)) & 1 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM t, unnest(t.sh) AS u(g), range(0, 64) AS p
  GROUP BY doc_id, p.range
)
SELECT doc_id,
       string_agg(CASE WHEN vote > 0 THEN '1' ELSE '0' END, '' ORDER BY pos) AS simhash_bits
FROM b GROUP BY doc_id ORDER BY doc_id
"""


@declare(
    "q_simhash_signature",
    oracle=QSIMSIG_ORACLE,
    description="SimHash fingerprints, md5 verifiable mode — bit-wise cross-engine equality (dedup [ext])",
)
def q_simhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.util import ensure_parallelism

    # a NULL text has no shingles hence no fingerprint — on either side
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("text").isNotNull()
    )
    # r12 (guide §2.5): 64 bit-votes over every shingle's md5 nibbles
    # per doc ran on the single-row-group scan's ONE core (14.6 s at
    # sf0.1) — spread before the fingerprint map.
    docs = ensure_parallelism(docs.select("doc_id", "text"), by="doc_id")
    return docs.select(
        "doc_id", dd.simhash_md5_bits(F.col("text")).alias("simhash_bits")
    ).orderBy("doc_id")


# Unigram LM quality score (perplexity-filter stand-in): per-doc mean
# -ln p(token) under the corpus's own unigram distribution.  Global
# term frequencies are one shuffle; the per-token -ln p values are
# rounded to 10 dp (absorbs libm 1-ulp differences) and accumulated as
# DECIMAL so the per-doc sum is order-independent and engine-exact.
QULM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents
), tf AS (
  SELECT term, COUNT(*) AS freq FROM toks GROUP BY term
), tot AS (
  SELECT CAST(SUM(freq) AS DOUBLE) AS total FROM tf
), scored AS (
  SELECT t.doc_id,
         CAST(ROUND(-LN(CAST(tf.freq AS DOUBLE) / tot.total), 10) AS DECIMAL(18,12)) AS nll
  FROM toks t JOIN tf USING (term), tot
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
FROM scored
GROUP BY doc_id
ORDER BY doc_id
"""


@declare(
    "q_unigram_logprob",
    oracle=QULM_ORACLE,
    description="unigram LM mean negative log-prob per doc — perplexity-filter stand-in (training pipeline [ext])",
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    tot = tf.agg(F.sum("freq").cast("double").alias("total"))
    # vocab ≪ corpus: broadcast both the frequency table and the 1-row
    # total so scoring is a map-side join over the exploded tokens
    scored = (
        toks.join(F.broadcast(tf), "term")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(-F.log(F.col("freq").cast("double") / F.col("total")), 10)
            .cast("decimal(18,12)")
            .alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("nll").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_nll"
            ),
        )
        .orderBy("doc_id")
    )


# PII scrub: the fixture corpus is PII-free word soup, so the query
# injects deterministic synthetic PII (one email always + a second on
# even doc_ids so the count column varies; IPv4 on doc_id%3=0; phone on
# doc_id%5=0) and the operator must count and scrub exactly
# those.  Counts and the md5 of the scrubbed text are oracle-checked —
# a wrong pattern, wrong replace order, or missed occurrence changes
# the hash.  Patterns live in textops.PII_PATTERNS (Java-regex ∩ RE2).
_PII_INJ_SQL = """
  text || ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
       || CASE WHEN doc_id % 2 = 0
               THEN ' cc backup.u' || CAST(doc_id AS VARCHAR) || '@alt.example.net'
               ELSE '' END
       || CASE WHEN doc_id % 3 = 0
               THEN ' src 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 100 AS VARCHAR)
               ELSE '' END
       || CASE WHEN doc_id % 5 = 0
               THEN ' tel +1-555-201-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               ELSE '' END
"""

QPII_ORACLE = f"""
WITH inj AS (
  SELECT doc_id, {_PII_INJ_SQL} AS t FROM documents
), red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]{{1,64}}@[A-Za-z0-9.-]{{1,253}}\\.[A-Za-z]{{2,63}}')) AS BIGINT) AS n_email,
         CAST(len(regexp_extract_all(t, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
         CAST(len(regexp_extract_all(t, '\\+\\d{{1,2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}')) AS BIGINT) AS n_phone,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]{{1,64}}@[A-Za-z0-9.-]{{1,253}}\\.[A-Za-z]{{2,63}}', '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
           '\\+\\d{{1,2}}-\\d{{3}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g') AS redacted
  FROM inj
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       CAST(LENGTH(redacted) AS BIGINT) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
ORDER BY doc_id
"""


@declare(
    "q_pii_redact",
    oracle=QPII_ORACLE,
    description="PII detection + scrub (email/IPv4/phone) over injected synthetic PII — counts and scrubbed-text md5 oracle-checked (training pipeline [ext])",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    did = F.col("doc_id")
    injected = F.concat(
        F.col("text"),
        F.lit(" contact u"),
        did.cast("string"),
        F.lit("@mail.example.com"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" cc backup.u"),
                did.cast("string"),
                F.lit("@alt.example.net"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" src 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" tel +1-555-201-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    withpii = docs.select("doc_id", injected.alias("t"))
    counts = tx.pii_counts(F.col("t"))
    return (
        withpii.select(
            "doc_id",
            counts["email"].alias("n_email"),
            counts["ipv4"].alias("n_ipv4"),
            counts["phone"].alias("n_phone"),
            tx.redact_pii(F.col("t")).alias("redacted"),
        )
        .select(
            "doc_id",
            "n_email",
            "n_ipv4",
            "n_phone",
            F.length("redacted").cast("long").alias("redacted_len"),
            F.md5("redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


# Temperature-scaled mixture resampling (the multilingual-corpus
# rebalancing rule: sampling probability ∝ share^alpha, alpha=0.5 —
# upweights tail sources without flattening completely).  sqrt() is
# IEEE-correctly-rounded in both engines; the tiny per-group sums are
# rounded→decimal-accumulated so the normalizer is bit-identical.
QMIXT_ORACLE = f"""
WITH g AS (
  SELECT source, lang, CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source, lang
), s AS (
  SELECT source, lang, n_tokens,
         CAST(n_tokens AS DOUBLE) / (SELECT CAST(SUM(n_tokens) AS DOUBLE) FROM g) AS share
  FROM g
), z AS (
  SELECT CAST(SUM(CAST(round(sqrt(share), 10) AS DECIMAL(18,12))) AS DOUBLE) AS norm FROM s
)
SELECT source, lang, n_tokens, share,
       sqrt(share) / norm AS p_temp,
       (sqrt(share) / norm) / share AS resample_weight
FROM s, z
ORDER BY source, lang
"""


@declare(
    "q_mixture_temperature",
    oracle=QMIXT_ORACLE,
    description="temperature-scaled (alpha=0.5) mixture resampling probabilities + weights per (source, lang) (training pipeline [ext])",
)
def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    g = docs.groupBy("source", "lang").agg(
        F.sum(F.size(tx.tokens(F.col("text")))).alias("n_tokens")
    )
    tot = g.agg(F.sum("n_tokens").cast("double").alias("tot"))
    s = g.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("tot")).alias("share"),
    )
    z = s.agg(
        F.sum(F.round(F.sqrt("share"), 10).cast("decimal(18,12)"))
        .cast("double")
        .alias("norm")
    )
    return (
        s.crossJoin(F.broadcast(z))
        .select(
            "source",
            "lang",
            "n_tokens",
            "share",
            (F.sqrt("share") / F.col("norm")).alias("p_temp"),
            ((F.sqrt("share") / F.col("norm")) / F.col("share")).alias(
                "resample_weight"
            ),
        )
        .orderBy("source", "lang")
    )


# Nearest-centroid assignment (the k-means/IVF inner kernel) with a
# fully SQL-expressible setup: centroids are the k=8 lowest-vec_id
# embeddings, every vector is assigned by squared-L2 with ties broken
# toward the lower centroid id, and per-cluster membership + exact
# decimal-accumulated distance mass is oracle-checked.  The iterative
# Lloyd refinement built on this kernel is kmeans_refine (exercised by
# the IVF recall tests); the assignment step is the part that touches
# all 100 TB, so it is the part the oracle pins.
QKMA_ORACLE = """
WITH eb AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
), c AS (
  SELECT vec_id AS cid, embedding AS cvec FROM eb ORDER BY vec_id LIMIT 8
), d AS (
  SELECT e.vec_id, c.cid,
         round(list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
                  * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE)))), 6) AS d2
  FROM eb e CROSS JOIN c
), a AS (
  SELECT vec_id, cid, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
  FROM d
)
SELECT cid,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CAST(d2 AS DECIMAL(18,6))) AS DOUBLE) AS sum_d2
FROM a WHERE rn = 1
GROUP BY cid
ORDER BY cid
"""


@declare(
    "q_kmeans_assign",
    oracle=QKMA_ORACLE,
    description="nearest-centroid assignment (k-means kernel, broadcast codebook): per-cluster sizes + exact distance mass (clustering [ext])",
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a NULL embedding would NULL every distance and collapse the
    # assignment (NULL-fuzz sweep) — vectors without id or embedding
    # are outside the clustering frame on both sides
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"].filter(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    cents = (
        emb.orderBy("vec_id")
        .limit(8)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    assigned = sim.assign_nearest(emb, "vec_id", "embedding", cents)
    return (
        assigned.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("d2").cast("decimal(18,6)")).cast("double").alias("sum_d2"),
        )
        .orderBy("cid")
    )


# Deterministic weighted sampling by PRIORITY SAMPLING (bottom-n of
# u/w with md5-derived uniforms, weight = token count).  Chosen over
# Efraimidis–Spirakis keys because u^(1/w)/log() are libm-dependent in
# their last ulp; one IEEE division is correctly rounded everywhere,
# so the sampled SET (not just its size) hash-matches cross-engine.
# Physically a global bottom-k (TakeOrdered) — no corpus shuffle.
_HEX13_U_SQL = """
(list_sum(list_transform(range(1, 14),
    i -> CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS DOUBLE)
         * (16.0 ^ (13 - i)))) + 0.5) / (16.0 ^ 13)
"""

QPSAMPLE_ORACLE = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents
  WHERE doc_id IS NOT NULL
), p AS (
  SELECT doc_id, n_tokens,
         ({_HEX13_U_SQL}) / CAST(n_tokens AS DOUBLE) AS priority
  FROM t WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, priority FROM p ORDER BY priority, doc_id LIMIT 50
"""


@declare(
    "q_priority_sample",
    oracle=QPSAMPLE_ORACLE,
    description="deterministic weighted sample (priority sampling, md5 uniforms, weight = token count) — sampled set hash-matched (training pipeline [ext])",
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.relational import priority_sample

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # identity keys the md5 uniform, weight must be positive — NULL ids
    # (whose NULL priority sorts OPPOSITE ways in Spark and SQL) and
    # token-free docs are out of the sampling frame on both sides
    weighted = docs.select(
        "doc_id", F.size(tx.tokens(F.col("text"))).cast("long").alias("n_tokens")
    ).filter(F.col("doc_id").isNotNull() & (F.col("n_tokens") > 0))
    return priority_sample(weighted, "doc_id", "n_tokens", 50)
