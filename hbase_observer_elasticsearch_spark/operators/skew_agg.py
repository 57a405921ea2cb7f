"""Skew-safe aggregation queries (SURVEY §2.3 aggregations, 100 TB path).

The events table has exactly 5 event types — at 100 TB a plain
``groupBy(event_type)`` with large partial state funnels 20 TB per key
through 5 reducers. These queries demonstrate the two mitigation shapes,
both oracle-checked against the plain GROUP BY (same answer, skew-free
plan):

- `two_stage` salted aggregation (functions/skew.py) for algebraic
  aggregates with large partials;
- exact COUNT(DISTINCT) via pre-distinct on (key, value) — the distinct
  shuffle spreads by value, so a hot key never converges on one reducer
  until it is already one row per distinct value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.skew import two_stage
from ..registry import register
from ..session import ensure_session_conf


@register(
    "agg_salted_heavy_hitters",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(MAX(value) AS DOUBLE) AS max_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY event_type
""",
)
def agg_salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter aggregation via salted two-stage + pre-distinct count.

    Identical answer to the single-shuffle GROUP BY (the oracle), but no
    reducer ever sees more than 1/n_salt of a hot key's rows (stage 1)
    or more than one row per (key, salt) (stage 2).
    """
    ensure_session_conf(spark)
    ev = load_table(spark, sf_dir, "events")

    base = two_stage(
        ev.select("event_type", "user_id", "value"),
        keys=["event_type"],
        partial_aggs=[
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
            F.max("value").alias("m"),
        ],
        final_aggs=[
            F.sum("c").alias("n_events"),
            F.sum("s").cast("double").alias("sum_value"),
            F.max("m").cast("double").alias("max_value"),
        ],
    )
    # exact distinct: shuffle spreads over (event_type, user_id) — one row
    # per distinct pair survives before the per-key count
    users = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    return base.join(users, "event_type")
