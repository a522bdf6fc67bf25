"""Relational NULL-fuzz contract guard (compact form of
``NULLFUZZ_CLASS=relational scripts/null_fuzz_contract.py``, which
sweeps all 207 relational-table queries): the TPC-H sf fixtures carry
no NULLs, so a Spark-vs-oracle divergence in NULL handling on the
relational tables is invisible to every driver round.  This fixture
injects the degenerate sub-graph the script uses — NULL keys, NULL
measures, NULL dates, one all-NULL row per table — and asserts
hash-identical results for one representative query per fixed family.

The round-9 relational sweep this pins fixed (42 findings): ANSI
divide-by-zero on degenerate groups (zero-variance OLS design,
COUNT(DISTINCT)=0 regressors, all-zero-outcome trend groups),
Spark-vs-SQL NULL *ordering* flips on window/NTILE/ECDF/bottom-k axes,
collection aggregates (collect_list skips NULLs, SQL list() keeps
them), SQL GREATEST clamping NULL bins to bucket 0, NULL orderkeys
escaping every IVM modulo delete filter under three-valued logic,
concat_ws skipping NULL md5-split key parts where SQL || propagates
them, COUNT(DISTINCT) vs distinct() on NULL pairs, a NULL-priority
Croston lane the SQL recursion can never extend, and a NULL-id ER
cluster the equality join can never label.
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb
import pytest

# battery class (r13 suite split — see pytest.ini): excluded from the
# default fast-core run the round driver's verify window executes
pytestmark = pytest.mark.slow

from jibaro_spark.queries import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
RELATIONAL = "region nation customer supplier part orders lineitem".split()

_TS = datetime(2024, 3, 15, 12, 0, 0)
# same injected sub-graph as scripts/null_fuzz_contract.RELATIONAL_ROWS
RELATIONAL_ROWS = {
    "region": [{}],
    "nation": [
        {"n_nationkey": 91, "n_name": "NULLLAND", "n_regionkey": None},
        {},
    ],
    "customer": [
        {"c_custkey": 90000003, "c_name": "Customer#NULL1", "c_nationkey": 91},
        {"c_custkey": 90000004, "c_acctbal": 1234.56, "c_mktsegment": "BUILDING"},
        {},
    ],
    "supplier": [
        {"s_suppkey": 90000005, "s_name": "Supplier#NULL"},
        {},
    ],
    "part": [
        {"p_partkey": 90000006},
        {},
    ],
    "orders": [
        {"o_orderkey": 90000002, "o_custkey": 90000003, "o_orderstatus": "O"},
        {
            "o_orderkey": 90000007,
            "o_totalprice": 999.99,
            "o_orderdate": _TS,
            "o_orderpriority": "1-URGENT",
        },
        {},
    ],
    "lineitem": [
        {
            "l_orderkey": 90000002,
            "l_partkey": 90000006,
            "l_suppkey": 90000005,
            "l_linenumber": 1,
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": _TS,
        },
        {
            "l_quantity": 17.0,
            "l_extendedprice": 1000.0,
            "l_discount": 0.05,
            "l_tax": 0.02,
        },
        {
            "l_orderkey": 90000002,
            "l_partkey": 90000006,
            "l_suppkey": 90000005,
            "l_linenumber": 2,
            "l_quantity": 5.0,
            "l_extendedprice": 500.0,
            "l_discount": 0.0,
            "l_tax": 0.0,
        },
        {},
    ],
}

# one per fixed family: degenerate-group ANSI division (OLS det=0,
# Oaxaca COUNT(DISTINCT)=0), window NULL ordering, collection
# aggregates, GREATEST bucket clamp, IVM modulo escape, DQ
# NULL-as-violation, distributed NTILE axis, KMV NULL md5, checksum
# concat_ws vs ||, ER NULL-id cluster, FD COUNT(DISTINCT), skyline
# NULL dominance, Croston NULL-priority recursion
FAMILY_QUERIES = [
    "q_ols_two_feature",
    "q_oaxaca_gap",
    "q_window_palette",
    "q_collect_palette",
    "q_value_histogram",
    "q_incremental_agg",
    "q_dq_expectations",
    "q_ntile_customers",
    "q_kmv_distinct",
    "q_partition_checksums",
    "q_er_pipeline",
    "q_fd_violations",
    "q_skyline_parts",
    "q_croston_demand",
]


@pytest.fixture(scope="module")
def rel_fuzz_dir(tmp_path_factory):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("relnullfuzz"))
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(out, f"{t}.parquet")
        if t in RELATIONAL_ROWS:
            # pyarrow append preserves every physical type byte-for-byte
            tab = pq.read_table(sp)
            rows = RELATIONAL_ROWS[t]
            arrays = [
                pa.array([r.get(f.name) for r in rows], type=f.type)
                for f in tab.schema
            ]
            pq.write_table(
                pa.concat_tables([tab, pa.table(arrays, schema=tab.schema)]), dp
            )
        else:
            shutil.copyfile(sp, dp)
    return out


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", FAMILY_QUERIES)
def test_relational_null_fuzz_family(spark, rel_fuzz_dir, name):
    dq = REGISTRY[name]
    df = dq.fn(spark, rel_fuzz_dir)
    cols, rows = df.columns, [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = os.path.join(rel_fuzz_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        rel = con.sql(dq.oracle)
        d_cols, d_rows = list(rel.columns), rel.fetchall()
    finally:
        con.close()
    assert sorted(cols) == sorted(d_cols)
    assert len(rows) == len(d_rows), f"{name}: {len(rows)} vs {len(d_rows)}"
    assert _canon(cols, rows) == _canon(d_cols, d_rows), name


def test_null_fences_are_scan_pushed(spark):
    """The sweep's NOT-NULL fences must cost a pushed scan filter, not
    a post-scan stage: IsNotNull lands in PushedFilters for a
    representative fenced query (the pre-declared ≤5% bench claim)."""
    import contextlib
    import io
    import re

    df = REGISTRY["q_winsorized_stats"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pushed = re.search(r"PushedFilters: \[(.*?)\]", plan)
    assert pushed, plan
    assert "IsNotNull(l_returnflag)" in pushed.group(1), pushed.group(1)
    assert "IsNotNull(l_extendedprice)" in pushed.group(1), pushed.group(1)


# ---------------------------------------------------------------------------
# Degenerate-FLOAT class (NaN / ±Inf with VALID keys, so the rows pass
# every NULL fence and reach the arithmetic).  The final 270-target
# sweep (NULLFUZZ_CLASS=floatdegen, extended to embeddings + events —
# see BASELINE.md / COVERAGE.md) measured: 152 queries identical, 19
# refuse on BOTH engines (ANSI fail-fast on non-finite → decimal/bigint
# casts — a shared loud contract), 94 where DuckDB refuses the decimal
# cast while Spark answers (Spark 4.x casts NaN/Inf → NULL in
# double→decimal even under ANSI; the refusal is the oracle
# scaffolding's, not the engine's), and EIGHT silent value divergences
# — the dangerous class, fixed with explicit finite fences on both
# sides and pinned in the 8-entry FLOAT_FAMILY_QUERIES guard below.
# DuckDB's own NaN BETWEEN is inconsistent
# between constant folding (false) and vectorized execution (true), so
# comparison-sensitive queries cannot rely on raw NaN semantics.

FLOAT_ROWS = {
    "customer": [
        {"c_custkey": 91000001, "c_name": "Customer#NAN", "c_nationkey": 1,
         "c_acctbal": float("nan"), "c_mktsegment": "BUILDING"},
        {"c_custkey": 91000002, "c_name": "Customer#INF", "c_nationkey": 1,
         "c_acctbal": float("inf"), "c_mktsegment": "BUILDING"},
    ],
    "part": [
        {"p_partkey": 91000003, "p_name": "nan part", "p_brand": "Brand#91",
         "p_type": "STANDARD NAN", "p_size": 1,
         "p_retailprice": float("nan")},
    ],
    "orders": [
        {"o_orderkey": 91000004, "o_custkey": 91000001, "o_orderstatus": "O",
         "o_totalprice": float("nan"),
         "o_orderdate": datetime(1996, 6, 15, 12, 0, 0),
         "o_orderpriority": "3-MEDIUM"},
    ],
    "lineitem": [
        {"l_orderkey": 91000004, "l_partkey": 91000003, "l_suppkey": 1,
         "l_linenumber": 1, "l_quantity": float("nan"),
         "l_extendedprice": float("inf"), "l_discount": 0.05,
         "l_tax": float("nan"), "l_returnflag": "N", "l_linestatus": "O",
         "l_shipdate": datetime(1996, 6, 15, 12, 0, 0)},
    ],
    # a broken encoder emitting NaN/Inf vectors is a REALISTIC corpus
    # state — the numpy block kernels must agree with the oracle on it
    "embeddings": [
        {"vec_id": 91000010, "embedding": [float("nan")] + [0.1] * 63,
         "label": 1},
        {"vec_id": 91000011, "embedding": [float("inf")] + [0.2] * 63,
         "label": 2},
        # NULL COMPONENT: Spark's ~exists finite fence drops it under
        # three-valued logic; the oracle lambda is NULL-aware
        # (x IS NULL OR NOT isfinite(x)) so both sides agree (ADVICE r9)
        {"vec_id": 91000014, "embedding": [None] + [0.3] * 63,
         "label": 3},
    ],
    "events": [
        {"event_id": 91000012, "ts": datetime(2024, 1, 5, 10, 0, 0),
         "user_id": 7, "event_type": "click", "value": float("nan"),
         "props": '{"k": 1}'},
    ],
}

FLOAT_FAMILY_QUERIES = [
    "q_dq_expectations",
    "q_ntile_customers",
    "q_skyline_parts",
    # embedding kernels: a NaN cosine passes DuckDB's NaN-largest >=
    # threshold but fails numpy's — finite-vector fences on both sides
    "q_embedding_near_dup",
    "q_embedding_dedup_clusters",
    "q_streaming_semdedup_batch",
    # NaN on a quantile/deviation axis; Inf through the bucketing cast
    "q_mad_outliers",
    "q_range_join_price_bands",
]


@pytest.fixture(scope="module")
def float_fuzz_dir(tmp_path_factory):
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    out = str(tmp_path_factory.mktemp("floatfuzz"))
    for t in TABLES:
        sp = os.path.join(src, f"{t}.parquet")
        dp = os.path.join(out, f"{t}.parquet")
        if t in FLOAT_ROWS:
            tab = pq.read_table(sp)
            rows = FLOAT_ROWS[t]
            arrays = [
                pa.array([r.get(f.name) for r in rows], type=f.type)
                for f in tab.schema
            ]
            pq.write_table(
                pa.concat_tables([tab, pa.table(arrays, schema=tab.schema)]), dp
            )
        else:
            shutil.copyfile(sp, dp)
    return out


@pytest.mark.parametrize("name", FLOAT_FAMILY_QUERIES)
def test_float_degenerate_family(spark, float_fuzz_dir, name):
    dq = REGISTRY[name]
    df = dq.fn(spark, float_fuzz_dir)
    cols, rows = df.columns, [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = os.path.join(float_fuzz_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        rel = con.sql(dq.oracle)
        d_cols, d_rows = list(rel.columns), rel.fetchall()
    finally:
        con.close()
    assert sorted(cols) == sorted(d_cols)
    assert len(rows) == len(d_rows), f"{name}: {len(rows)} vs {len(d_rows)}"
    assert _canon(cols, rows) == _canon(d_cols, d_rows), name
