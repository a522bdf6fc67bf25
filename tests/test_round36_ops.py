"""Round-36 family tests: histogram IVM mass conservation and
branch coverage vs a scratch recompute.
"""

from __future__ import annotations

from jibaro_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_incremental_histogram_mass(spark):
    import duckdb

    rows = REGISTRY["q_incremental_histogram"].fn(spark, SF).collect()
    assert rows
    total = sum(r["n"] for r in rows)
    want = duckdb.sql(
        f"""
        WITH surviving AS (
          SELECT * FROM '{SF}/orders.parquet' WHERE o_orderkey % 13 <> 0
        )
        SELECT COUNT(*) + SUM(CASE WHEN o_orderkey % 9 = 0 THEN 1 ELSE 0 END)
        FROM surviving
        """
    ).fetchall()[0][0]
    assert total == want  # every surviving + inserted row lands in a bin
    assert all(r["n"] > 0 for r in rows)
    bins = [r["bin"] for r in rows]
    assert bins == sorted(bins) and len(bins) == len(set(bins))
