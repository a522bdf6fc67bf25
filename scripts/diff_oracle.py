"""Diff one declared query's Spark result against its DuckDB oracle.

Usage: python scripts/diff_oracle.py q_sessionize_events [sf_dir]
Mimics the driver's canonicalization (sort columns by name, sort rows,
compare values) and prints the first differing cells.
"""
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

from jibaro_spark.session import build_session  # noqa: E402
from jibaro_spark.queries import REGISTRY  # noqa: E402

spark = build_session()
dq = REGISTRY[name]
sdf = dq.fn(spark, sf_dir).toPandas()

con = duckdb.connect()
for t in (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split():
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )
odf = con.execute(dq.oracle).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


s, o = canon(sdf), canon(odf)
print("spark dtypes:\n", s.dtypes)
print("oracle dtypes:\n", o.dtypes)
print("shapes:", s.shape, o.shape)

ndiff = 0
for col in s.columns:
    sv, ov = s[col], o[col]
    try:
        eq = (sv == ov) | (sv.isna() & ov.isna())
    except Exception as e:
        print(f"col {col}: compare error {e}")
        continue
    bad = ~eq
    if bad.any():
        idx = bad[bad].index[:5]
        print(f"col {col}: {bad.sum()} mismatches")
        for i in idx:
            print(f"  row {i}: spark={sv[i]!r} oracle={ov[i]!r}")
        ndiff += bad.sum()
print("TOTAL mismatched cells:", ndiff)
