"""Event-stream declared queries: sessionization, time windows, as-of
joins, JSON extraction (SURVEY §2.10 T5 [ext], §2.4 J4, §2.8 F9).

The reference has no watermark/window surface (SURVEY §2.10 T5 —
explicitly absent); these are the [ext] batch equivalents.  The
streaming (watermarked) variants of the same logic live in
:mod:`jibaro_spark.streaming` and are covered by pytest, since the
DuckDB oracle is batch-only.

Scale notes: sessionization is a single window per ``user_id`` — one
shuffle on the session key, no self-join; the as-of join is expressed
as union-free join + window rather than a per-row subquery, which at
100 TB becomes a shuffle on ``user_id`` with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jibaro_spark.queries.registry import declare, dsum, load_tables

SESSION_GAP_SECONDS = 6 * 3600


# FLOOR epoch-seconds, in exact integer arithmetic (timedegen class,
# r12): Spark's `cast(timestamp as long)` FLOORS (1969-12-31
# 23:59:59.999999 -> -1) while DuckDB's DATE_DIFF('second', ...)
# truncates epoch toward zero (same instant -> 0), so the two sides
# disagreed on sub-second gaps straddling a second boundary at
# negative epochs.  The contract is declared as floor on BOTH sides;
# EPOCH_US keeps year-9999 micros exact where double EPOCH() cannot
# (2.5e17 > 2^53), and the ((x % d) + d) % d dance turns DuckDB's
# truncating integer division into floor division.
_FLOOR_SEC = (
    "((EPOCH_US({t}) - ((EPOCH_US({t}) % 1000000) + 1000000) % 1000000) "
    "// 1000000)"
)

QSESS_ORACLE = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
), flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                OR {_FLOOR_SEC.format(t='ts')}
                   - {_FLOOR_SEC.format(t='prev_ts')}
                   > {SESSION_GAP_SECONDS}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT user_id, ts, event_id,
         -- CAST: DuckDB window SUM yields HUGEINT (float64 via pandas);
         -- Spark yields BIGINT — align for the driver's value hash
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST({_FLOOR_SEC.format(t='MAX(ts)')}
            - {_FLOOR_SEC.format(t='MIN(ts)')} AS BIGINT) AS duration_s
FROM numbered
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


@declare("q_sessionize_events", oracle=QSESS_ORACLE, description="gap-based sessionization via lag + cumulative sum windows (W3 [ext])")
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timeline fence (see q_markov_transitions): no timestamp or user →
    # no position on a per-user timeline, on either side
    ev = load_tables(spark, sf_dir, "events")["events"].filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    return (
        ev.select("user_id", "ts", "event_id")
        .withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS), 1).otherwise(0),
        )
        .withColumn("session_seq", F.sum("is_new").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias(
                "duration_s"
            ),
        )
        .orderBy("user_id", "session_seq")
    )


QWIN_ORACLE = """
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY day, event_type
ORDER BY day, event_type
"""


@declare("q_event_daily_windows", oracle=QWIN_ORACLE, description="tumbling time-window aggregation (T5 [ext] batch form)")
def q_event_daily_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .orderBy("day", "event_type")
    )


# As-of join (J4 [ext]): each purchase joined to the same user's latest
# click at-or-before the purchase time.  Join + window-rank, not a
# correlated subquery — the distributed-friendly formulation.
QASOF_ORACLE = """
WITH purchases AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), ranked AS (
  SELECT p.purchase_id, p.user_id, p.purchase_ts, c.click_id, c.click_ts,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
  FROM purchases p
  JOIN clicks c ON p.user_id = c.user_id AND c.click_ts <= p.purchase_ts
)
SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
FROM ranked WHERE rn = 1
ORDER BY purchase_id
"""


@declare("q_asof_purchase_click", oracle=QASOF_ORACLE, description="as-of join: latest prior event per key (J4 [ext])")
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.relational import asof_join

    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        asof_join(
            purchases,
            clicks,
            left_on="user_id",
            right_on="c_user_id",
            left_time="purchase_ts",
            right_time="click_ts",
            right_tiebreak="click_id",
        )
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
        .orderBy("purchase_id")
    )


QJSON_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
       CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS k_mod5
FROM events
ORDER BY event_id
"""


@declare("q_json_extract_props", oracle=QJSON_ORACLE, description="JSON extraction from string column (F9 json)")
def q_json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select(
        "event_id", k.alias("k_value"), (k % 5).alias("k_mod5")
    ).orderBy("event_id")


# Latest-event-per-user — the reference's A3 dedup pattern
# (``cdc.py:132-142``) applied to the events fixture.
QLATEST_ORACLE = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
"""


@declare("q_latest_event_per_user", oracle=QLATEST_ORACLE, description="latest-per-key dedup via row_number window (A3)")
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jibaro_spark.operators.dedup import dedup_latest

    ev = load_tables(spark, sf_dir, "events")["events"]
    return (
        dedup_latest(ev, keys=["user_id"], order_by=["ts", "event_id"])
        .select("user_id", "event_id", "ts", "event_type", "value")
        .orderBy("user_id")
    )


# Funnel: per user, earliest view -> first click within 1 day of the
# view -> first purchase within 1 day of that click (ordered stage
# progression with a conversion horizon, so stages genuinely vary:
# 90/35/25 at sf0.01; identical formulation in both engines).
QFUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
    AND e.ts <= v.t_view + INTERVAL 1 DAY
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    AND e.ts <= c.t_click + INTERVAL 1 DAY
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CASE WHEN p.user_id IS NOT NULL THEN 3
            WHEN c.user_id IS NOT NULL THEN 2
            ELSE 1 END AS funnel_stage
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""


@declare(
    "q_event_funnel",
    oracle=QFUNNEL_ORACLE,
    description="ordered view→click→purchase funnel per user (W3/J1 [ext] sequence analysis)",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    day = F.expr("INTERVAL 1 DAY")
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + day)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.when(F.col("t_purchase").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .otherwise(1)
            .alias("funnel_stage"),
        )
        .orderBy("user_id")
    )
