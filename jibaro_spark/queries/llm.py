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
            ELSE 'fr' END AS detected_lang
FROM scored
ORDER BY doc_id
"""


@declare("q_text_language_id", oracle=QLANG_ORACLE, description="heuristic stopword-vote language ID (text analysis [ext])")
def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        tx.language_id(F.col("text")).alias("detected_lang"),
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
       label
FROM embeddings
ORDER BY vec_id
"""


@declare("q_embedding_norms", oracle=QNORM_ORACLE, description="vector L2 norms via native array aggregate (J6 support)")
def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return emb.select(
        "vec_id",
        F.round(F.sqrt(sim.l2_norm_sq(F.col("embedding"))), 6).alias("l2_norm"),
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
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
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
         list_distinct(list_transform(
           range(1, greatest(len(words) - 2, 1) + 1),
           i -> array_to_string(words[i:i+2], ' ')
         )) AS s
  FROM toks
)
SELECT id_a, id_b, jaccard FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
           / CAST(len(list_distinct(a.s || b.s)) AS DOUBLE) AS jaccard
  FROM sh a, sh b
  WHERE a.doc_id < b.doc_id
) WHERE jaccard >= 0.3
ORDER BY id_a, id_b
"""


@declare("q_ngram_jaccard_pairs", oracle=QNGRAM_ORACLE, description="exact n-gram Jaccard over inverted-index candidates (dedup [ext])")
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.3
    ).orderBy("id_a", "id_b")


# Fixture max pairwise cosine is ~0.6 — below the LSH regime, so the
# declared query uses the exact block-matmul path (which also makes it
# oracle-checkable); the LSH variant is exercised in tests at its
# high-threshold design point.
QEMBDUP_ORACLE = """
SELECT id_a, id_b, cosine_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6)
           AS cosine_sim
  FROM embeddings a, embeddings b
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
       len({_TOKS}) AS n_ws_tokens
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


@declare(
    "q_rolling_fingerprint",
    oracle=None,
    description="winnowing rolling-hash document sketch (xxhash64 — no DuckDB equivalent; rows-only, verified in tests)",
)
def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # Scalar projection of the sketch (the driver's canonicalizer can't
    # sort array cells); the array itself is covered in test_units.
    fp = F.col("fingerprint")
    return (
        docs.select(
            "doc_id", tx.rolling_hash_fingerprint(F.col("text")).alias("fingerprint")
        )
        .select(
            "doc_id",
            F.size(fp).cast("long").alias("n_hashes"),
            F.get(fp, 0).alias("fp_min"),
            F.get(fp, F.size(fp) - 1).alias("fp_max"),
            F.concat_ws(",", fp.cast("array<string>")).alias("fp_sig"),
        )
        .orderBy("doc_id")
    )
