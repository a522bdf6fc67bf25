"""Vector similarity operators ([ext], SURVEY §2.4 J5/J6).

Embeddings are ``array<float>`` columns.  Dot products / norms are
native ``zip_with`` + ``aggregate`` expressions accumulating in
**double** (JVM-side; deterministic left-to-right order — important
both for oracle comparison and reproducible ranking).

Two search strategies:

* ``knn_bruteforce`` — exact top-k by cosine; the correctness baseline.
  Queries side is broadcast; the corpus is scanned once.  Right answer
  up to ~10⁵ queries × any corpus size (it's a map-side broadcast
  nested loop + per-query top-k, no shuffle of the corpus).
* ``knn_lsh`` — random-hyperplane (sign) LSH: deterministic
  pseudo-random hyperplanes derived from ``xxhash64(plane, dim)``, so
  the plan is reproducible with no stored model.  Candidates join on
  band buckets; exact cosine re-ranks.  This is the 100 TB path: the
  corpus is bucketed once, queries probe buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.operators.util import ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns, double accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity (0 for zero vectors rather than NaN)."""
    d = dot(a, b)
    na, nb = l2_norm_sq(a), l2_norm_sq(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(
        d / (F.sqrt(na) * F.sqrt(nb))
    )


def knn_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    round_decimals: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan → window.

    Similarity is rounded before ranking and ties break on corpus id,
    so results are stable across engines and partitionings.
    Excludes self-matches when ids collide.
    """
    sim = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), round_decimals)
    pairs = (
        ensure_parallelism(corpus).crossJoin(F.broadcast(queries))
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(
            F.col(query_id),
            F.col(corpus_id),
            sim.alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col(corpus_id)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sign(vec: Column, plane: Column, dim: int) -> Column:
    """Sign bit of <vec, h_plane> where h_plane[d] = ±1 derived from
    xxhash64(plane, d) — deterministic pseudo-random hyperplane."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x.cast("double")
            * F.when(F.xxhash64(plane, d) % 2 == 0, 1.0).otherwise(-1.0),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_signature(vec: Column, dim: int, num_planes: int = 16) -> Column:
    """Sign-LSH signature as array<int> of 0/1 bits."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_planes - 1)),
        lambda p: _hyperplane_sign(vec, p, dim),
    )


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    query_vec: str,
    corpus_id: str,
    corpus_vec: str,
    k: int,
    dim: int,
    num_planes: int = 16,
    bands: int = 4,
    round_decimals: int = 6,
) -> DataFrame:
    """Approximate cosine top-k via banded sign-LSH + exact re-rank.

    The signature's ``num_planes`` bits split into ``bands`` bands; a
    corpus vector is a candidate if it matches the query in at least
    one full band.  Exact cosine then ranks the candidates.  Recall is
    tunable with (planes, bands); the shuffle is on band buckets only.
    """
    rows = num_planes // bands

    def banded(df: DataFrame, idc: str, vecc: str, out: str) -> DataFrame:
        sig = lsh_signature(F.col(vecc), dim, num_planes)
        return (
            df.withColumn("__sig", sig)
            .select(
                F.col(idc),
                F.col(vecc),
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(bands - 1)),
                        lambda bnd: F.struct(
                            bnd.alias("band_idx"),
                            F.xxhash64(
                                bnd, F.slice("__sig", bnd * rows + 1, rows)
                            ).alias("band_hash"),
                        ),
                    )
                ).alias(out),
            )
            .select(idc, vecc, f"{out}.band_idx", f"{out}.band_hash")
        )

    qb = banded(queries, query_id, query_vec, "qb")
    cb = banded(ensure_parallelism(corpus), corpus_id, corpus_vec, "cb")
    cand = (
        qb.join(cb, ["band_idx", "band_hash"])
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, query_vec, corpus_id, corpus_vec)
        .dropDuplicates([query_id, corpus_id])
    )
    sim = F.round(cosine(F.col(query_vec), F.col(corpus_vec)), round_decimals)
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col(corpus_id)
    )
    return (
        cand.select(F.col(query_id), F.col(corpus_id), sim.alias("cosine_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 16,
    bands: int = 4,
    round_decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the same banded LSH
    self-join (id_a < id_b), exact-cosine verified."""
    rows = num_planes // bands
    sig = lsh_signature(F.col(vec_col), dim, num_planes)
    banded = (
        ensure_parallelism(df).withColumn("__sig", sig)
        .select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda bnd: F.struct(
                        bnd.alias("band_idx"),
                        F.xxhash64(bnd, F.slice("__sig", bnd * rows + 1, rows)).alias(
                            "band_hash"
                        ),
                    ),
                )
            ).alias("b"),
        )
        .select("__id", "__vec", "b.band_idx", "b.band_hash")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("a.__vec").alias("vec_a"),
            F.col("b.__id").alias("id_b"),
            F.col("b.__vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), round_decimals)
    return (
        pairs.withColumn("cosine_sim", sim)
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )
