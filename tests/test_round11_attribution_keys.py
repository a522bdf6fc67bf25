"""Round-11 guard: q_attribution_credit under degenerate purchase ids.

ADVICE r10: keying probes by purchase ``event_id`` alone merged probes
of distinct purchases sharing a (duplicate or NULL) event_id and picked
one nondeterministically — diverging from the oracle, which itself
merged by pid.  Both sides now use exact per-purchase-ROW semantics
(Spark: (user, purchase-ts, event_id, within-class row_number); oracle:
a synthetic unique ROW_NUMBER over purchases), so every purchase row
credits its window independently, deterministically, on both engines.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _ts(day: int) -> datetime:
    return datetime(2024, 1, 1, 12, 0, 0) + timedelta(days=day - 1)


@pytest.fixture(scope="module")
def degenerate_events(spark, tmp_path_factory):
    """Duplicate purchase event_ids across users AND two fully
    identical purchase rows for one user."""
    events = spark.createDataFrame(
        [
            # user 1: one click then a purchase with event_id 100
            (1, _ts(1), 1, "click", 1.0, None),
            (100, _ts(2), 1, "purchase", 1.0, None),
            # user 2: one view then a purchase with the SAME event_id
            (2, _ts(1), 2, "view", 1.0, None),
            (100, _ts(2), 2, "purchase", 1.0, None),
            # user 3: one click then TWO fully identical purchase rows
            (3, _ts(1), 3, "click", 1.0, None),
            (200, _ts(2), 3, "purchase", 1.0, None),
            (200, _ts(2), 3, "purchase", 1.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    fx = str(tmp_path_factory.mktemp("attr") / "fx")
    events.coalesce(1).write.parquet(f"{fx}/events.parquet")
    return fx


def test_per_purchase_row_semantics(spark, degenerate_events):
    from jibaro_spark.queries import REGISTRY

    rows = {
        r.channel: r
        for r in REGISTRY["q_attribution_credit"]
        .fn(spark, degenerate_events)
        .collect()
    }
    # pair semantics: u1's purchase credits its click, u2's its view,
    # and EACH of u3's two identical purchases credits the click
    c, v = rows["click"], rows["view"]
    assert (c.n_touches, c.first_touch, c.last_touch) == (3, 3, 3)
    assert c.linear_credit == pytest.approx(3.0, abs=1e-9)
    assert (v.n_touches, v.first_touch, v.last_touch) == (1, 1, 1)
    assert v.linear_credit == pytest.approx(1.0, abs=1e-9)


def test_oracle_matches_on_degenerate_fixture(spark, degenerate_events):
    """Two-sided: the rewritten oracle produces the same rows on the
    degenerate fixture (the old pid-partition oracle would merge the
    three 'purchase windows sharing an event_id' cases)."""
    duckdb = pytest.importorskip("duckdb")
    from jibaro_spark.queries import REGISTRY

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{degenerate_events}/events.parquet/*.parquet'"
    )
    oracle = {
        r[0]: r[1:]
        for r in con.execute(REGISTRY["q_attribution_credit"].oracle).fetchall()
    }
    got = {
        r.channel: (r.n_touches, r.linear_credit, r.first_touch, r.last_touch)
        for r in REGISTRY["q_attribution_credit"]
        .fn(spark, degenerate_events)
        .collect()
    }
    assert set(got) == set(oracle)
    for ch in got:
        assert got[ch] == pytest.approx(oracle[ch], abs=1e-9)
