"""Declared queries: time-series surface — gap-filled resampling and
exact medians.

The reference's only temporal logic is lexicographic timestamp argmax
(SURVEY.md §1.2); a complete engine resamples event streams onto dense
calendars (the feature-engineering shape: every (entity, day) cell
exists, zeros filled) without a driver-side loop: the calendar is
``sequence()`` per entity, exploded and left-joined — all distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events


@declare(
    "daily_user_series_gapfilled",
    oracle="""
WITH span AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY user_id
), cal AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM span
), daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY user_id, day
)
SELECT c.user_id, strftime(c.day, '%Y-%m-%d') AS day,
       coalesce(d.n, 0) AS n_events
FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
""",
)
def q_daily_user_series_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily activity series: per-user [min_day, max_day]
    calendar via ``sequence()`` explode, left join of actual daily
    counts, zero-fill. Two shuffles on user keys (span agg + daily agg);
    the calendar explode is narrow. At 100 TB the calendar side is
    |users|·|days| rows — bounded and uniform, no skew."""
    # day via integer µs arithmetic (date_from_unix_date), NOT
    # to_date(timestamp) — the latter shifts with the session timezone,
    # the driver's vanilla session doesn't pin one, and DuckDB casts the
    # naive parquet timestamp calendar-wise (≡ UTC interpretation).
    ev = load_events(spark, sf_dir).select(
        "user_id",
        F.date_from_unix_date(
            F.floor(F.col("ts_us") / 86_400_000_000).cast("int")
        ).alias("day"),
    )
    span = ev.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
    )
    daily = ev.groupBy("user_id", "day").agg(F.count("*").alias("n"))
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@declare(
    "median_order_cents_by_priority",
    oracle="""
SELECT o_orderpriority,
       median(CAST(round(o_totalprice * 100) AS BIGINT)) AS median_cents,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
""",
)
def q_median_order_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median over integer cents per priority class. Exact
    percentiles need the full sorted group (expensive — the approx twin
    ``value_percentiles_sketch`` is the 100 TB default); on integer cents
    the type-7 midpoint interpolation is exact in both engines, so this
    one is oracle-checked bit-for-bit."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.percentile(F.col("cents"), F.lit(0.5)).alias("median_cents"),
            F.count("*").alias("n_orders"),
        )
    )
