"""Declared queries: temporal joins (as-of, range attribution) over the
events stream. The oracle uses DuckDB's native ASOF JOIN — our union +
window sort-merge must reproduce it exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.temporal import (
    asof_join,
    interval_join_bucketed,
    range_attribution,
)
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


_WINDOW_US = 1_800_000_000  # 30-minute containment window == bucket width


@declare(
    "interval_join_bucketed",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value
  FROM events
  WHERE ts IS NOT NULL AND event_id IS NOT NULL AND epoch_us(ts) >= 0
), anchors AS (
  SELECT event_id AS anchor_event_id,
         ts_us - {_WINDOW_US} AS start_us,
         ts_us AS end_us
  FROM ev
  WHERE event_type = 'purchase' AND value IS NOT NULL
  ORDER BY value DESC, event_id ASC LIMIT 20
)
SELECT a.anchor_event_id, a.start_us, a.end_us,
       count(e.event_id) AS n_events,
       count(DISTINCT e.user_id) AS n_users
FROM anchors a LEFT JOIN ev e
  ON e.ts_us >= a.start_us AND e.ts_us <= a.end_us
GROUP BY a.anchor_event_id, a.start_us, a.end_us
""",
)
def q_interval_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval containment join — all-stream activity inside the
    30-minute window ending at each of the top-20 purchases by value.
    No equality conjunct exists, so naive Spark plans a BNLJ; the
    operator rewrites it as explode-to-buckets + hash equi-join on the
    bucket with containment as residual (operators/temporal.py). Oracle:
    DuckDB's native inequality join, same window."""
    ev = (
        load_events(spark, sf_dir)
        .filter(
            F.col("ts_us").isNotNull() & F.col("event_id").isNotNull()
            & (F.col("ts_us") >= 0)
        )
        .select("event_id", "user_id", "ts_us", "event_type", "value")
    )
    anchors = (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(20)
        .select(
            F.col("event_id").alias("anchor_event_id"),
            (F.col("ts_us") - _WINDOW_US).alias("start_us"),
            F.col("ts_us").alias("end_us"),
        )
    )
    points = ev.select("event_id", "user_id", "ts_us")
    joined = interval_join_bucketed(
        anchors, points, start="start_us", end="end_us", ts="ts_us",
        bucket_us=_WINDOW_US,
    )
    return joined.groupBy("anchor_event_id", "start_us", "end_us").agg(
        F.count("p_event_id").alias("n_events"),
        F.countDistinct("p_user_id").alias("n_users"),
    )


_ATTR_HORIZON_US = 30 * 60 * 1_000_000  # 30 minutes, matches the streaming twin


@declare(
    "unattributed_clicks_census",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
), p AS (
  SELECT user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
), flags AS (
  SELECT c.user_id, c.event_id,
         CASE WHEN EXISTS (
           SELECT 1 FROM p
           WHERE p.user_id = c.user_id
             AND p.ts_us > c.ts_us
             AND p.ts_us <= c.ts_us + {_ATTR_HORIZON_US}
         ) THEN 1 ELSE 0 END AS attributed
  FROM c
)
SELECT user_id,
       count(*) AS n_clicks,
       CAST(sum(attributed) AS BIGINT) AS n_attributed,
       CAST(count(*) - sum(attributed) AS BIGINT) AS n_unattributed
FROM flags GROUP BY user_id
""",
)
def q_unattributed_clicks_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LEFT-OUTER half of attribution: per user, how many clicks
    converted to a purchase within 30 minutes and how many never did —
    the abandonment metric the inner-join attribution can't see. A
    click with several qualifying purchases counts ONCE (semi-join
    semantics, not join multiplicity). Plan: one left-semi join on
    user with the time band as residual, one anti-side count via the
    total — both shuffles keyed on user_id, skew-safe. The streaming
    twin ``streaming_left_outer_attribution`` emits the same flags via
    a watermarked stream-stream LEFT OUTER join."""
    ev = load_events(spark, sf_dir)
    c = ev.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select("user_id", "event_id", "ts_us")
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select(F.col("user_id").alias("p_user"), F.col("ts_us").alias("p_ts"))
    attributed = c.join(
        p,
        (c["user_id"] == p["p_user"])
        & (p["p_ts"] > c["ts_us"])
        & (p["p_ts"] <= c["ts_us"] + F.lit(_ATTR_HORIZON_US)),
        "left_semi",
    ).groupBy("user_id").agg(F.count("*").alias("n_attributed"))
    totals = c.groupBy("user_id").agg(F.count("*").alias("n_clicks"))
    return (
        totals.join(attributed, "user_id", "left")
        .select(
            "user_id",
            "n_clicks",
            F.coalesce(F.col("n_attributed"), F.lit(0)).cast("bigint")
            .alias("n_attributed"),
            (F.col("n_clicks")
             - F.coalesce(F.col("n_attributed"), F.lit(0))).cast("bigint")
            .alias("n_unattributed"),
        )
    )
