"""Event-time windowing in batch form: tumbling / sliding / session.

These are the batch twins of the streaming operators in ``streaming/``
(same `F.window` / `F.session_window` expressions run over a bounded
DataFrame), mirroring how the reference's time-triggered flush slices the
mutation stream into 30 s batches
(observer6/ElasticSearchBulkOperator.java:61).

Scale notes: window assignment is map-side (each event computes its
window(s) locally); the only shuffle is the grouped aggregation keyed on
(window, key) — identical cost profile to a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.deterministic import dsum, sql_dsum
from ..registry import register
from ..session import ensure_session_conf


@register(
    "window_tumbling",
    oracle=f"""
SELECT date_trunc('day', ts) AS win_start,
       event_type,
       COUNT(*) AS n,
       {sql_dsum("value")} AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day event-time windows per event type.

    `F.window(ts, '1 day')` aligns to the epoch, which for whole days ==
    date_trunc('day') — giving the oracle an exact ANSI twin.
    """
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "window_sliding",
    oracle=f"""
WITH assigned AS (
  SELECT date_trunc('day', ts) AS w0, ts, value FROM events
  UNION ALL
  SELECT date_trunc('day', ts) - INTERVAL 1 DAY AS w0, ts, value FROM events
)
SELECT w0 AS win_start,
       COUNT(*) AS n,
       {sql_dsum("value")} AS sum_value
FROM assigned
GROUP BY w0
""",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 2-day duration, 1-day slide (each event lands in
    two windows). The oracle materializes the same assignment with a
    2-way UNION — which is exactly what Spark's window expression expands
    to internally (an explode over duration/slide copies)."""
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )


@register(
    "window_session",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
sessions AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
""",
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user via
    `F.session_window` — session end = last event + gap, matching the
    oracle's gaps-and-islands formulation exactly.

    In streaming this same expression runs stateful with a watermark;
    batch and stream share the operator definition.
    """
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
