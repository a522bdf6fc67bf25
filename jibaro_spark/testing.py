"""Oracle-comparison utilities — a local re-implementation of the
driver's check (row count + schema + order-insensitive value
comparison vs DuckDB) so every declared query is verified in pytest
before the driver ever sees it."""

from __future__ import annotations

import math
from datetime import date, datetime
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from jibaro_spark.queries.registry import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB with the fixture tables registered as views (the driver's
    setup, per the __spark_entry__ stub docstring)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Driver-style tolerant normalization for floats.
        return round(v, 6)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_with_oracle(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> None:
    """Assert spark result == duckdb result (column-name-sorted,
    row-order-insensitive, float-rounded)."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c for c in rel.columns]
    d_rows = rel.fetchall()

    assert sorted(s_cols) == sorted(
        d_cols
    ), f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    assert len(s_rows) == len(
        d_rows
    ), f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    sn = _normalize(s_rows, s_cols)
    dn = _normalize(d_rows, d_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sn, dn)) if a != b
    ]
    assert not mismatches, (
        f"value mismatch ({len(mismatches)}/{len(sn)} rows); first: "
        f"{mismatches[0]}"
    )


def run_query(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.queries import REGISTRY

    return REGISTRY[name].fn(spark, sf_dir)
