"""Registry plumbing for declared queries.

Cross-engine determinism rules (Spark vs DuckDB value-hash):

* **Sums/averages of doubles are accumulated as DECIMAL** and cast to
  double at the end.  Floating-point addition is order-dependent and
  Spark's partial aggregation order differs from DuckDB's; decimal
  accumulation is exact, so both engines produce bit-identical doubles.
* **Averages** are computed as ``CAST(SUM(decimal) AS DOUBLE) / COUNT``
  in both engines (decimal division scales/rounds differently per
  engine; double division of identical operands is deterministic).
* **Every computed column is aliased identically** in the Spark and
  SQL forms (the driver sorts columns by name before hashing).
* **Ties are broken deterministically** (explicit tiebreaker columns in
  every ORDER BY / window used for ranking).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(name: str, oracle: str | None = None, description: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate declared query {name!r}")
        REGISTRY[name] = DeclaredQuery(name, fn, oracle, description)
        return fn

    return deco


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load fixture parquet tables (TESTDATA.md layout).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS).  Spark ≤ 4.0
    maps it to long only under ``spark.sql.legacy.parquet.nanosAsLong``
    (set here, not only in the session builder, so the queries also run
    under the driver's own session), which we floor-convert to a
    microsecond timestamp; Spark 4.1+ ignores that legacy conf and
    reads nanos as TIMESTAMP_NTZ (truncated to micros), which we cast
    to TIMESTAMP under the UTC session timezone.  Both paths land on
    the same LTZ microsecond timestamps, matching DuckDB's
    ``CAST(ts AS TIMESTAMP)`` truncation of TIMESTAMP_NS.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # UTC so LTZ conversions (timestamp_micros below) are invariant to
    # the host session's timezone — the driver runs queries under ITS
    # session, not ours, and DuckDB is timezone-naive.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # The driver runs queries under ITS session, possibly launched from
    # a cwd where Python workers cannot import jibaro_spark — ship the
    # package (idempotent, ~once per session) so pandas-UDF closures
    # (multimodal decode) resolve on workers regardless of driver cwd.
    from jibaro_spark.session import _ship_package

    _ship_package(spark)
    out: dict[str, DataFrame] = {}
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        for fld in df.schema.fields:
            if n == "events" and fld.name == "ts":
                if fld.dataType.simpleString() == "bigint":
                    df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
                elif fld.dataType.simpleString() == "timestamp_ntz":
                    # NTZ wall-clock reinterpreted as UTC == the
                    # timestamp_micros() value of the nanosAsLong path
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        out[n] = df
    return out


def dsum(col, alias: str, scale: int = 4):
    """Exact decimal-accumulated sum of a double column, as double."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double").alias(alias)
    )


def davg(col, alias: str, scale: int = 4):
    """Deterministic average: exact decimal sum / count, double division."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")
        / F.count(F.col(col))
    ).alias(alias)
