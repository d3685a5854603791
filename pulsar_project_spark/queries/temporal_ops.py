"""Declared queries: temporal joins (as-of, range attribution) over the
events stream. The oracle uses DuckDB's native ASOF JOIN — our union +
window sort-merge must reproduce it exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.temporal import asof_join, range_attribution
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

_LOOKBACK_US = 3_600_000_000  # 1 hour


@declare(
    "asof_last_purchase",
    oracle="""
WITH p0 AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value
  FROM events WHERE event_type = 'purchase'
), p AS (
  SELECT user_id, ts_us, event_id, value FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
                                 ORDER BY event_id DESC) AS rn FROM p0
  ) WHERE rn = 1
), c AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts_us,
       p.event_id AS asof_event_id, p.ts_us AS asof_ts_us, p.value AS asof_value
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts_us <= c.ts_us
""",
)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's latest purchase at-or-before it —
    the as-of join via union + window sort-merge (one shuffle+sort on
    (user, ts); no join node). Oracle: DuckDB native ASOF JOIN."""
    ev = load_events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", "event_id", "value"
    )
    return asof_join(
        clicks, purchases, key="user_id", ts="ts_us",
        payload=["event_id", "ts_us", "value"], tiebreak="event_id",
    ).select(
        "event_id", "user_id", "ts_us",
        F.col("asof_event_id"),
        F.col("asof_ts_us"),
        F.col("asof_value"),
    )


@declare(
    "attribution_window_join",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us, p.value,
       count(c.ts_us) AS n_clicks,
       max(c.ts_us) AS last_click_ts_us
FROM p LEFT JOIN c
  ON p.user_id = c.user_id
 AND c.ts_us >= p.ts_us - {_LOOKBACK_US} AND c.ts_us <= p.ts_us
GROUP BY p.event_id, p.user_id, p.ts_us, p.value
""",
)
def q_attribution_window_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: clicks attributed to each purchase within a 1-hour
    lookback — equi-join on user with the time band as residual
    condition (hash join + band filter; AQE handles hot-user skew)."""
    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    return range_attribution(
        purchases, clicks, key="user_id", ts="ts_us", lookback=_LOOKBACK_US,
        agg_cols=[
            F.count(F.col("r.ts_us")).alias("n_clicks"),
            F.max(F.col("r.ts_us")).alias("last_click_ts_us"),
        ],
    )
