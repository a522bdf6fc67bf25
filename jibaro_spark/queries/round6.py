"""Round-6 declared queries.

Each query is a PySpark callable hash-checked by the driver against a
DuckDB oracle at sf0.01 (see :mod:`jibaro_spark.queries.registry`).
This module adds the VERDICT-r5 asks: the protobuf codec round trip
(the driver-visible twin of ``q_avro_roundtrip``), the verifiable
count-min-sketch mode, and the q-gram-blocked edit-distance join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jibaro_spark.queries.llm import _zipgrams
from jibaro_spark.queries.registry import declare, load_tables

# ---------------------------------------------------------------------------
# Protobuf codec round trip, driver-checked (VERDICT r5 §Next-3): rows
# → proto3 payload (programmatic FileDescriptorProto, no protoc) →
# Confluent frame with message-index byte → native wire slice →
# Arrow decode → rows.  decode(encode(x)) == x makes the ORACLE the
# source rows themselves — any drift in varint framing, field
# numbering, or the message-index parse breaks the hash.  The Avro
# twin is q_avro_roundtrip (round5.py); this one additionally proves
# the per-worker runtime self-heal (proto_python.ensure_protobuf_runtime)
# works under the driver's own session, where $PYTHONPATH enablement
# cannot be assumed.  Fixture columns are non-null at every SF, so
# proto3's absent-scalar defaulting cannot alias a value.
QPROTO_RT_ORACLE = """
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
FROM documents
WHERE doc_id IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
ORDER BY doc_id
"""


@declare(
    "q_proto_roundtrip",
    oracle=QPROTO_RT_ORACLE,
    description="Confluent protobuf encode→frame→slice→decode round trip over documents — jar-free codec chain hash-checked against the source rows (F5 [ext])",
)
def q_proto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from jibaro_spark.codecs.confluent import payload_of, schema_id_of, wire_encode
    from jibaro_spark.codecs.proto_python import (
        decode_protobuf_python,
        encode_protobuf_python,
    )

    # proto3 scalars cannot represent NULL (absent encodes as ""/0),
    # so decode(encode(x)) == x only holds for fully non-null rows —
    # filter them on BOTH sides (the oracle's WHERE mirrors this);
    # the Avro twin keeps nullable lang/n_chars via union encoding
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    rec = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), nullable=False),
            T.StructField("lang", T.StringType(), nullable=True),
            T.StructField("n_chars", T.LongType(), nullable=True),
        ]
    )
    framed = encode_protobuf_python(
        docs.select(
            F.struct(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col("lang"),
                F.col("n_chars").cast("long").alias("n_chars"),
            ).alias("v")
        ),
        "v",
        rec,
    ).select(wire_encode(F.col("payload"), 47, "protobuf").alias("value"))
    sliced = framed.select(
        schema_id_of("value").alias("sid"),
        payload_of("value", "protobuf").alias("payload"),
    )
    decoded = decode_protobuf_python(sliced, "payload", rec)
    return (
        decoded.filter(F.col("sid") == 47)
        .select("value.doc_id", "value.lang", "value.n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Edit-distance join in q-gram signature mode (VERDICT r5 §Next-4):
# NO blocking key — candidates come from the Ed-Join document-
# frequency-ordered prefix signature (operators/dedup.edit_distance_
# join), which is LOSSLESS by the prefix-filter theorem for ANY q.
# q is the discrimination knob: it must satisfy |alphabet|^q >> corpus
# or every gram is common and the inverted index fans out (customer
# names are digit-dominated, so q=2 has ~150 distinct grams across
# 15k names — measured 84 s at sf0.1; q=4 → 4.5M candidates / ~15 s;
# q=8 — an 8-digit window that nearly pins the full numeric id —
# cuts candidate fan-out another 3× to ~5 s with identical output.
# Losslessness does not depend on q (prefix-filter theorem + the
# small-string fallback bucket), so tune q to the workload freely.
# The oracle is the brute-force all-pairs Levenshtein answer, so a
# driver hash match proves the signature path loses no true pair and
# invents none.  Customer names differ only in their digit block —
# plentiful ed≤1 pairs (19.5k at sf0.01), zero at ed=0 (names unique).
QEDQ_ORACLE = """
SELECT a.c_custkey AS lid, b.c_custkey AS rid,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY lid, rid
"""


@declare(
    "q_edit_distance_qgram",
    oracle=QEDQ_ORACLE,
    description="edit-distance self-join via df-ordered q-gram prefix signatures (Ed-Join) — keyless lossless blocking, hash-checked against brute force (J5 [ext])",
)
def q_edit_distance_qgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import edit_distance_join

    cust = load_tables(spark, sf_dir, "customer")["customer"]
    a = cust.select(F.col("c_custkey").alias("lid"), F.col("c_name").alias("lname"))
    b = cust.select(F.col("c_custkey").alias("rid"), F.col("c_name").alias("rname"))
    pairs = edit_distance_join(
        a, b, "lid", "rid", "lname", "rname", max_dist=1, qgram=8
    )
    return (
        pairs.filter(F.col("lid") < F.col("rid"))
        .select("lid", "rid", F.col("dist").cast("int").alias("dist"))
        .orderBy("lid", "rid")
    )


# ---------------------------------------------------------------------------
# Count-min sketch in verifiable md5 mode (VERDICT r5 §Next-6): with a
# deterministic cross-engine hash, CMS estimates are a pure function of
# the data — the oracle REPLAYS the sketch (cell counts per (row,col))
# and the d-way min lookup in SQL, so the driver hash-checks the whole
# sketch→merge-law→lookup pipeline, not just row counts.  The xxhash64
# production mode (q_cms_heavy_hitters) keeps its pytest error-bound
# checks; cell math here is conv(substr(md5(d|term),1,8),16,10) % width
# == DuckDB CAST('0x'||substr(md5(...),1,8) AS BIGINT) % width.
_CMS_TOKS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
QCMS_MD5_ORACLE = f"""
WITH toks AS (
  SELECT unnest({_CMS_TOKS}) AS term FROM documents
), ds AS (
  SELECT unnest([0, 1, 2, 3]) AS d
), sketch AS (
  SELECT d.d AS row,
         CAST(('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || term), 1, 8)) AS BIGINT) % 1024 AS col,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks, ds d
  GROUP BY 1, 2
), est AS (
  SELECT t.term, MIN(s.cnt) AS est
  FROM (SELECT DISTINCT term FROM toks) t
  CROSS JOIN ds d
  JOIN sketch s
    ON s.row = d.d
   AND s.col = CAST(('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || t.term), 1, 8)) AS BIGINT) % 1024
  GROUP BY t.term
)
SELECT term, CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, term LIMIT 25
"""


@declare(
    "q_cms_heavy_hitters_md5",
    oracle=QCMS_MD5_ORACLE,
    description="count-min heavy hitters, verifiable md5 hash mode — the SQL oracle replays sketch cells and d-way min lookup exactly (sketch family [ext])",
)
def q_cms_heavy_hitters_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.sketches import cms_estimates
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    terms = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    return (
        cms_estimates(terms, "term", depth=4, width=1024, hash_mode="md5")
        .select("term", F.col("est").cast("long").alias("est"))
        .orderBy(F.col("est").desc(), "term")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence from the corpus token distribution — the
# data-mixture drift metric (which sources are unrepresentative, and
# by how many nats) that complements q_mixture_reweight's mass-based
# weights.  KL(P_s‖Q) = Σ_t p(t|s)·ln(p(t|s)/q(t)); every probability
# is a ratio of exact integer counts, the per-term contribution is
# rounded then DECIMAL-summed (order-free — the repo's established
# float-sum determinism trick), and ln() runs on identical doubles in
# both engines.  Scale shape: one token-keyed count shuffle, the
# per-source totals are a broadcast dimension, and the term-frequency
# join is key-partitioned — no corpus re-scan, no driver collect.
_R6_TOKS = "string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')"
QKL_ORACLE = f"""
WITH toks AS (
  SELECT source, unnest({_R6_TOKS}) AS term FROM documents
), st AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n_st
  FROM toks GROUP BY source, term
), s AS (
  SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM st GROUP BY source
), t AS (
  SELECT term, CAST(SUM(n_st) AS BIGINT) AS n_t FROM st GROUP BY term
), g AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS n FROM t
)
SELECT st.source,
       MIN(s.n_s) AS n_tokens,
       ROUND(CAST(SUM(CAST(ROUND(
           (CAST(st.n_st AS DOUBLE) / s.n_s)
           * ln((CAST(st.n_st AS DOUBLE) * g.n)
                / (CAST(s.n_s AS DOUBLE) * t.n_t)), 8)
         AS DECIMAL(28,10))) AS DOUBLE), 6) AS kl_nats
FROM st
JOIN s USING (source)
JOIN t USING (term)
CROSS JOIN g
GROUP BY st.source
ORDER BY st.source
"""


@declare(
    "q_source_kl_divergence",
    oracle=QKL_ORACLE,
    description="per-source KL divergence from the corpus unigram distribution — data-mixture drift in nats, decimal-summed for cross-engine exactness (LLM mixture [ext])",
)
def q_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    toks = docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
    st = toks.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n_st")
    )
    st = st.localCheckpoint(eager=True)  # three aggregates share this pass
    s = st.groupBy("source").agg(F.sum("n_st").cast("long").alias("n_s"))
    t = st.groupBy("term").agg(F.sum("n_st").cast("long").alias("n_t"))
    g = t.agg(F.sum("n_t").cast("long").alias("n"))
    contrib = F.round(
        (F.col("n_st").cast("double") / F.col("n_s"))
        * F.log(
            (F.col("n_st").cast("double") * F.col("n"))
            / (F.col("n_s").cast("double") * F.col("n_t"))
        ),
        8,
    ).cast("decimal(28,10)")
    return (
        st.join(F.broadcast(s), "source")
        .join(t, "term")
        .crossJoin(F.broadcast(g))
        .groupBy("source")
        .agg(
            F.min("n_s").alias("n_tokens"),
            F.round(F.sum(contrib).cast("double"), 6).alias("kl_nats"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Repeated-window spans: which 8-token windows occur in MORE THAN ONE
# document — the distributed approximation of suffix-array substring
# dedup (the "repeated passages" signal used to trim memorized
# boilerplate from training corpora; cf. dedup literature on exact
# substring matching at N tokens).  Per doc: window count and how many
# of its window POSITIONS are corpus-repeated, the per-doc trim
# budget.  Scale shape: one explode (≈ token count per doc), one
# window-keyed count, one semi-join back — all linear; production
# would xxhash64 the window string before the shuffle (Spark hashes
# the key either way; the plain string keeps the oracle exact).
QDUPWIN_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_R6_TOKS} AS tk FROM documents
), wins AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= 8
              THEN {_zipgrams('tk', 8)}
              ELSE [] END AS ws
  FROM toks
), w AS (
  SELECT doc_id, unnest(ws) AS win FROM wins
), rep AS (
  SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT wins.doc_id,
       CAST(len(wins.ws) AS BIGINT) AS n_windows,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_windows
FROM wins
LEFT JOIN (
  SELECT w.doc_id, COUNT(*) AS n_dup
  FROM w JOIN rep USING (win) GROUP BY w.doc_id
) d USING (doc_id)
ORDER BY wins.doc_id
"""


@declare(
    "q_dup_window_spans",
    oracle=QDUPWIN_ORACLE,
    description="corpus-repeated 8-token windows per document — the distributed substring-dedup (repeated-passage) trim signal (dedup family [ext])",
)
def q_dup_window_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tokens

    docs = load_tables(spark, sf_dir, "documents")["documents"]
    # r13 NOTE (measured, rejected): spreading the tokenize+window map
    # (the q_repetition_stats treatment) ABAB'd a wash here (1.358 vs
    # 1.287, steal 0.03%) — this query's cost is the eager pin WRITE of
    # the window arrays plus two shuffles of them, not the map compute,
    # so the extra text exchange buys nothing.  Unspread stays.
    # Tokenize into a column FIRST so the window lambda slices a bound
    # array reference — inlining split(...) inside the lambda re-splits
    # the whole text once per window position (O(doc_len²) per doc).
    toked = docs.select("doc_id", tokens(F.col("text")).alias("tk"))
    base = toked.select(
        "doc_id",
        F.when(
            F.size("tk") >= 8,
            F.expr(
                "transform(sequence(1, size(tk) - 7),"
                " i -> concat_ws(' ', slice(tk, i, 8)))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("ws"),
    )
    base = base.localCheckpoint(eager=True)  # explode + per-doc sizes share it
    w = base.select("doc_id", F.explode("ws").alias("win"))
    rep = (
        w.groupBy("win")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("win")
    )
    per_doc = (
        w.join(rep, "win", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup"))
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.size("ws").cast("long").alias("n_windows"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup_windows"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Grouped OLS trend: per event type, the least-squares slope of value
# over time — the distributed "is this metric drifting" primitive.
# Closed form from five sufficient statistics (n, Σx, Σy, Σxy, Σx²),
# each an EXACT integer: x is epoch-microseconds centered on the
# group's min (bounds the magnitudes), y is value scaled to integer
# micro-units.  Spark accumulates in DECIMAL(38,0), DuckDB in HUGEINT
# — no float sum anywhere until the single final division, so the
# hash is bit-exact.  One groupBy for the center, one for the sums;
# the center table is a broadcast dimension.
QTREND_ORACLE = """
WITH v AS (
  SELECT event_type, epoch_us(ts) AS x,
         CAST(ROUND(value * 1000000) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
), c AS (
  SELECT event_type, MIN(x) AS x0 FROM v GROUP BY event_type
), s AS (
  SELECT v.event_type,
         CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(v.x - c.x0 AS HUGEINT)) AS sx,
         SUM(CAST(v.y AS HUGEINT)) AS sy,
         SUM(CAST(v.x - c.x0 AS HUGEINT) * v.y) AS sxy,
         SUM(CAST(v.x - c.x0 AS HUGEINT) * (v.x - c.x0)) AS sxx
  FROM v JOIN c USING (event_type)
  GROUP BY v.event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) * 86400000000, 6)
         AS slope_per_day
FROM s ORDER BY event_type
"""


@declare(
    "q_trend_slopes",
    oracle=QTREND_ORACLE,
    description="per-group OLS slope of value over time from exact integer sufficient statistics — drift detection with a bit-exact cross-engine hash (A9/W3 [ext])",
)
def q_trend_slopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_tables(spark, sf_dir, "events")["events"]
    v = events.filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "event_type",
        F.unix_micros("ts").alias("x"),
        F.round(F.col("value") * 1000000, 0).cast("long").alias("y"),
    )
    c = v.groupBy("event_type").agg(F.min("x").alias("x0"))
    dec = "decimal(38,0)"
    xc = (F.col("x") - F.col("x0")).cast(dec)
    s = (
        v.join(F.broadcast(c), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast(dec).alias("n"),
            F.sum(xc).cast(dec).alias("sx"),
            F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
            F.sum(xc * F.col("y")).cast(dec).alias("sxy"),
            F.sum(xc * (F.col("x") - F.col("x0"))).cast(dec).alias("sxx"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round(num / den * F.lit(86400000000.0), 6).alias("slope_per_day"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# SCD2 point-in-time join: facts resolve against the dimension VERSION
# that was valid at the fact's timestamp — the warehouse temporal join
# (distinct from the as-of family: the predicate is validity-interval
# membership, not nearest-neighbor).  Dim = the q_scd2_history build
# (every 5th order repriced effective 1998-12-01); facts = lineitem
# rows timestamped by l_shipdate, which straddles the effective date,
# so both the expired and the fresh versions receive hits.  Scale
# shape: ONE equi-join on the dimension key carrying the interval
# predicate as a residual filter — key-partitioned, never a range
# cross join; versions-per-key is small by construction (SCD2 keeps
# one open + closed history), so per-key fan-out is bounded.
QSCD2PIT_ORACLE = """
WITH dim AS (
  SELECT o_orderkey, o_totalprice,
         CAST(o_orderdate AS DATE) AS valid_from,
         CAST(NULL AS DATE) AS valid_to
  FROM orders
), chg AS (
  SELECT o_orderkey,
         CAST(o_totalprice + 100.0 AS DOUBLE) AS o_totalprice,
         DATE '1998-12-01' AS eff
  FROM orders WHERE o_orderkey % 5 = 0
), expired AS (
  SELECT d.o_orderkey, d.o_totalprice, d.valid_from, c.eff AS valid_to
  FROM dim d JOIN chg c USING (o_orderkey)
), untouched AS (
  SELECT d.* FROM dim d ANTI JOIN chg c USING (o_orderkey)
), fresh AS (
  SELECT o_orderkey, o_totalprice, eff AS valid_from, CAST(NULL AS DATE) AS valid_to
  FROM chg
), scd2 AS (
  SELECT * FROM expired UNION ALL SELECT * FROM untouched
  UNION ALL SELECT * FROM fresh
), fact AS (
  SELECT l_orderkey, CAST(l_shipdate AS DATE) AS fd, l_quantity
  FROM lineitem WHERE l_shipdate IS NOT NULL
), joined AS (
  SELECT f.l_orderkey, f.fd, f.l_quantity, s.o_totalprice,
         (s.valid_to IS NULL) AS hit_current
  FROM fact f JOIN scd2 s
    ON f.l_orderkey = s.o_orderkey
   AND f.fd >= s.valid_from
   AND (s.valid_to IS NULL OR f.fd < s.valid_to)
)
SELECT CAST(YEAR(fd) AS INT) AS ship_year, hit_current,
       CAST(COUNT(*) AS BIGINT) AS n_facts,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS dim_price_sum
FROM joined
GROUP BY ship_year, hit_current
ORDER BY ship_year, hit_current
"""


@declare(
    "q_scd2_pointintime",
    oracle=QSCD2PIT_ORACLE,
    description="point-in-time fact→SCD2-version join (validity-interval membership on the key partition) — the warehouse temporal join (J4/CDC family [ext])",
)
def q_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.cdc import scd2_apply

    t = load_tables(spark, sf_dir, "orders", "lineitem")
    orders = t["orders"]
    dim = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    chg = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") + F.lit(100.0)).cast("double").alias("o_totalprice"),
        F.lit("1998-12-01").cast("date").alias("eff"),
    )
    scd2 = scd2_apply(dim, chg, keys=["o_orderkey"], effective_col="eff")
    fact = t["lineitem"].filter(F.col("l_shipdate").isNotNull()).select(
        "l_orderkey",
        F.col("l_shipdate").cast("date").alias("fd"),
        "l_quantity",
    )
    joined = fact.join(
        scd2,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("fd") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("fd") < F.col("valid_to"))),
    ).select(
        "fd",
        "o_totalprice",
        F.col("valid_to").isNull().alias("hit_current"),
    )
    return (
        joined.groupBy(
            F.year("fd").cast("int").alias("ship_year"), "hit_current"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_facts"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("dim_price_sum"),
        )
        .orderBy("ship_year", "hit_current")
    )


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs (operators/textops.tfidf_cosine_pairs):
# the classic all-pairs similarity-search shape over an inverted
# index — the SPARSE sibling of the dense embedding kernels, and the
# IR-side near-duplicate signal (same docs, different vocabulary
# emphasis).  Pairs are restricted to within-source (the group guard
# that bounds Σ df² at scale); every float sum is round-then-decimal
# so the DuckDB replay is exact.
QSPARSE_ORACLE = f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
), toks AS (
  SELECT doc_id, source, unnest({_R6_TOKS}) AS t FROM corpus
), tf AS (
  SELECT doc_id, source, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, source, t
), dfq AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY t
), n AS (
  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM corpus
), w AS (
  SELECT tf.doc_id, tf.source, tf.t,
         CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS w
  FROM tf JOIN dfq df USING (t) CROSS JOIN n
), norms AS (
  SELECT doc_id,
         sqrt(CAST(SUM(CAST(ROUND(w * w, 8) AS DECIMAL(28,10))) AS DOUBLE)) AS nrm
  FROM w GROUP BY doc_id
), dots AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(SUM(CAST(ROUND(a.w * b.w, 8) AS DECIMAL(28,10))) AS DOUBLE) AS dot
  FROM w a JOIN w b ON a.t = b.t AND a.source = b.source
       AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.id_a, d.id_b,
       ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.id_a
JOIN norms nb ON nb.doc_id = d.id_b
WHERE ROUND(d.dot / (na.nrm * nb.nrm), 6) >= 0.35
ORDER BY id_a, id_b
"""


@declare(
    "q_sparse_cosine_pairs",
    oracle=QSPARSE_ORACLE,
    description="all-pairs sparse TF-IDF cosine via term-at-a-time inverted index, within-source groups (J5/IR [ext])",
)
def q_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.textops import tfidf_cosine_pairs

    # the IDF denominator is the corpus size — define the corpus as
    # identified, text-bearing docs on BOTH sides, or a single NULL row
    # shifts ln(n/df) for every term (NULL-fuzz sweep)
    docs = load_tables(spark, sf_dir, "documents")["documents"].filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    return (
        tfidf_cosine_pairs(
            docs, "doc_id", "text", group_col="source", min_cosine=0.35
        )
        .orderBy("id_a", "id_b")
    )
