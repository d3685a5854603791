"""Declared queries: ranking-window breadth (rank/dense_rank/ntile/
percent_rank/cume_dist) beyond the row_number retention patterns —
SURVEY.md §2.7 notes the reference needs none of these; a complete
analytic surface has them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events


@declare(
    "user_value_ranks",
    oracle="""
SELECT event_id, user_id, value,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS prank,
       cume_dist()    OVER w AS cdist
FROM (SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase')
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
""",
)
def q_user_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-function family per user over purchase values.
    percent_rank/cume_dist are exact rationals of row counts — identical
    doubles in both engines given the same total order (hence the
    event_id tiebreak)."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id", "user_id", "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


_WINSOR_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr
  FROM events
)
SELECT event_type,
       count(*) AS n,
       count(*) FILTER (pr < 0.01) AS n_below_p01,
       count(*) FILTER (pr > 0.99) AS n_above_p99
FROM ranked GROUP BY event_type
"""


@declare("winsorize_tail_counts", oracle=_WINSOR_SQL)
def q_winsorize_tail_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-trim accounting: per event type, how many values fall in
    the p01/p99 tails by exact percent_rank — the winsorization census
    a feature pipeline runs before clamping. percent_rank is the exact
    rational (rank−1)/(n−1); only comparisons against it are emitted
    (integer counts), so ties and float order never reach the output.

    Scale shape: one window shuffle on event_type, then a grouped count
    on the same key. Exact global order statistics per key need the
    sort; the approximate path for wider keys is value_percentiles_sketch
    (KLL)."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value")
    ranked = ev.select(
        "event_type", F.percent_rank().over(w).alias("pr")
    )
    return ranked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("pr") < 0.01, 1)).alias("n_below_p01"),
        F.count(F.when(F.col("pr") > 0.99, 1)).alias("n_above_p99"),
    )


_DECILE_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value NULLS LAST, event_id) AS decile
  FROM events
)
SELECT event_type, decile,
       count(*) AS n,
       min(value) AS lo,
       max(value) AS hi
FROM ranked GROUP BY event_type, decile
"""


@declare("equidepth_deciles_by_type", oracle=_DECILE_SQL)
def q_equidepth_deciles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: per event type, ntile(10) buckets with
    their row counts and [lo, hi] value bounds — the exact-quantile
    profile a feature pipeline materializes (the KLL sketch twin
    value_percentiles_sketch is the approximate path). The (value,
    event_id) tiebreak makes the tile assignment a total order, so
    bucket membership is deterministic; min/max/count only —
    no float arithmetic.

    Scale shape: one window shuffle on event_type + the same-key
    rollup. Exact per-key quantiles need the per-key sort; keys are
    processed independently so skew spreads across types."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(
        F.asc_nulls_last("value"), "event_id"
    )
    ranked = ev.select("event_type", "value", F.ntile(10).over(w).alias("decile"))
    return ranked.groupBy("event_type", "decile").agg(
        F.count("*").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


_DEBOUNCE_SQL = """
WITH seq AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY epoch_us(ts), event_id
         ) AS prev_us
  FROM events
)
SELECT event_type,
       count(*) AS n_total,
       count(*) FILTER (prev_us IS NULL OR ts_us - prev_us > 1000000) AS n_kept,
       count(*) FILTER (prev_us IS NOT NULL AND ts_us - prev_us <= 1000000) AS n_debounced
FROM seq GROUP BY event_type
"""


@declare("debounce_events_1s", oracle=_DEBOUNCE_SQL)
def q_debounce_events_1s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debounce census: an event is suppressed when the
    previous event of the SAME (user, type) lies within 1 second —
    double-click / retry noise removal. Reports kept vs debounced
    counts per type (the filter itself is the `n_kept` predicate).

    Scale shape: one window shuffle on (user_id, event_type), then a
    grouped count. Exact integer-microsecond comparisons only."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us", "event_id")
    seq = ev.select(
        "event_type", "ts_us", F.lag("ts_us").over(w).alias("prev_us")
    )
    keep = F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > 1_000_000)
    return seq.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(keep, 1)).alias("n_kept"),
        F.count(F.when(~keep, 1)).alias("n_debounced"),
    )
