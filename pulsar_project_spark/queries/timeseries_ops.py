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

from pyspark.sql.window import Window

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table


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


_EPOCH_2024_SEC = 1_704_067_200  # 2024-01-01 — recenter x so moments fit BIGINT


@declare(
    "user_value_trend",
    oracle=f"""
WITH xy AS (
  SELECT user_id,
         (epoch_us(ts) // 1000000) - {_EPOCH_2024_SEC} AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT user_id, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY user_id
)
SELECT user_id, n,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
            ELSE NULL END AS slope_cents_per_sec
FROM m
""",
)
def q_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed least-squares slope per user, BIT-EXACT: the moments
    (n, Σx, Σy, Σxy, Σx²) are integer sums — associative, so Spark's
    partial aggregation gives the same numbers as any single-node order —
    and the only float op is one final division. (The built-in
    ``regr_slope`` accumulates double covariances whose value depends on
    reduction order — unusable for cross-engine parity AND irreproducible
    across cluster sizes; this integer-moment form is how to make
    regression deterministic at 100 TB.) x is seconds re-centered to
    2024-01-01, y integer cents: every moment fits BIGINT."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    xy = ev.select(
        "user_id",
        (F.expr("ts_us div 1000000") - F.lit(_EPOCH_2024_SEC)).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    m = xy.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        "user_id", "n",
        F.when(den != 0, num.cast("double") / den.cast("double"))
         .otherwise(F.lit(None)).alias("slope_cents_per_sec"),
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


_MA7_SQL = """
WITH daily AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
)
SELECT day, rev_cents,
       CAST(sum(rev_cents) OVER w AS BIGINT) AS rev_7d_cents,
       count(*) OVER w AS n_days_in_window,
       CAST(CAST(sum(rev_cents) OVER w AS BIGINT) AS DOUBLE) / count(*) OVER w
         AS rev_7d_ma_cents
FROM daily
WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@declare("daily_revenue_7d_ma", oracle=_MA7_SQL)
def q_daily_revenue_7d_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day trailing moving average of daily purchase revenue — the
    classic smoothing window. Daily revenue folds to exact integer
    cents first; the MA is the single sum/count division (same IEEE
    double both engines). Row-frame (6 PRECEDING) over the daily
    series, which is tiny by construction.

    Scale shape: the data-sized work is the per-day cents aggregate
    (one shuffle, map-side partials); the window slides over ~30 rows.
    A years-long series is still only thousands of rows — window cost
    is never the term that scales with corpus size."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cents = F.round(F.col("value") * 100).cast("bigint")
    daily = ev.select(
        F.expr("ts_us div 86400000000").alias("day"), cents.alias("c")
    ).groupBy("day").agg(F.sum("c").alias("rev_cents"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).cast("bigint").alias("rev_7d_cents"),
        F.count("*").over(w).alias("n_days_in_window"),
        (F.sum("rev_cents").over(w).cast("double") / F.count("*").over(w))
        .alias("rev_7d_ma_cents"),
    )


_FFILL_SQL = """
WITH purchases AS (
  SELECT user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'purchase'
),
latest_per_day AS (
  SELECT user_id, day, cents FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, day
                                 ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM purchases
  ) WHERE rn = 1
),
span AS (
  SELECT user_id, min(day) AS d0 FROM purchases GROUP BY user_id
),
gmax AS (
  SELECT max(day) AS d1 FROM purchases
),
grid AS (
  SELECT s.user_id, unnest(generate_series(s.d0, g.d1)) AS day
  FROM span s CROSS JOIN gmax g
)
SELECT g.user_id, g.day,
       last_value(l.cents IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS carried_cents
FROM grid g LEFT JOIN latest_per_day l
  ON g.user_id = l.user_id AND g.day = l.day
"""


@declare("forward_fill_user_values", oracle=_FFILL_SQL)
def q_forward_fill_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation (LOCF — last observation carried
    forward): each user's latest purchase amount per day, carried
    across days with no purchase via ``last_value(... IGNORE NULLS)``
    over a per-user dense calendar running from that user's FIRST
    purchase day to the corpus's last day. The standard gap-fill for
    feature time series — every emitted cell has a carried value (the
    NULL prefix a full user × day grid would generate never exists).

    Scale shape: the observation reduction is one (user, day) shuffle;
    the calendar is a per-user ``sequence(d0, d1)`` explode — narrow,
    no cartesian product (round 2 built ``users.crossJoin(days)``; at
    100× the users-side that grid is the bill). The single global
    scalar (corpus max day) rides in as a 1-row broadcast — a constant
    ride, not a data-sized join. The carry window partitions per user
    over ~tens of rows."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    p = ev.select(
        "user_id",
        F.expr("ts_us div 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        "ts_us", "event_id",
    )
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.desc("ts_us"), F.desc("event_id")
    )
    latest = (
        p.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "cents")
    )
    span = p.groupBy("user_id").agg(F.min("day").alias("d0"))
    gmax = p.agg(F.max("day").alias("d1"))  # 1 row — broadcast constant ride
    grid = (
        span.crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    joined = grid.join(latest, ["user_id", "day"], "left")
    w_fill = (
        Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id", "day",
        F.last("cents", ignorenulls=True).over(w_fill).alias("carried_cents"),
    )


_DAY_US = 86_400_000_000


@declare(
    "ordered_funnel_stages",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), s1 AS (
  SELECT user_id, min(ts_us) AS t1 FROM ev
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts_us) AS t2
  FROM ev e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts_us > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts_us) AS t3
  FROM ev e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_viewed,
       (SELECT count(*) FROM s2) AS n_clicked_after_view,
       (SELECT count(*) FROM s3) AS n_purchased_after_click
""",
)
def q_ordered_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED conversion funnel — users whose first view precedes a
    click that precedes a purchase (strict event-sequence semantics; the
    unordered per-user counter funnel is ``conversion_funnel``). The
    oracle walks stage CTEs with joins; the engine needs NO join at all:
    three STACKED window minimums over the same (user) partition — t1 =
    min view ts, t2 = min click ts > t1, t3 = min purchase ts > t2 —
    chained selects reuse ONE shuffle+sort, then a global conditional
    count. At 100 TB the funnel costs one exchange of (user, type, ts)
    triples."""
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("ts_us").isNotNull() & F.col("user_id").isNotNull())
        .select("user_id", "event_type", "ts_us")
    )
    w = Window.partitionBy("user_id")
    t1 = ev.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts_us") > F.col("t1")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts_us") > F.col("t2")),
                F.col("ts_us"),
            )
        ).over(w),
    )
    per_user = t3.groupBy("user_id").agg(
        F.first("t1").alias("t1"), F.first("t2").alias("t2"),
        F.first("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


@declare(
    "cohort_retention_matrix",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_DAY_US} AS day
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND epoch_us(ts) >= 0
), cohort AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
       count(DISTINCT e.user_id) AS n_active
FROM ev e JOIN cohort c ON e.user_id = c.user_id
GROUP BY c.cohort_day, day_offset
""",
)
def q_cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention — users grouped by first-seen day, distinct
    actives per (cohort_day, day_offset) cell. The oracle joins a cohort
    CTE back to the stream; the engine computes cohort_day as a window
    min over the SAME user partition the distinct-count shuffle needs —
    no join, no second scan of the 100 TB stream."""
    ev = (
        load_events(spark, sf_dir)
        .filter(
            F.col("ts_us").isNotNull() & F.col("user_id").isNotNull()
            & (F.col("ts_us") >= 0)
        )
        .select("user_id", F.expr(f"ts_us div {_DAY_US}").alias("day"))
    )
    w = Window.partitionBy("user_id")
    withc = ev.withColumn("cohort_day", F.min("day").over(w))
    return withc.groupBy(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
    ).agg(F.countDistinct("user_id").alias("n_active"))


# Query pattern for the series-similarity scan: a one-week "ramp up,
# ramp down" purchase shape in exact cents, matched against each user's
# daily purchase-cents series over one fixed calendar week of the
# corpus (days 19723+10 .. +16 = 2024-01-11 .. 2024-01-17).
_PATTERN_CENTS = (500, 1500, 3000, 5000, 3000, 1500, 500)
_WEEK_START_DAY = 19733


@declare(
    "series_pattern_distance_topk",
    oracle=f"""
WITH ev AS (
  SELECT user_id,
         epoch_us(ts) // {_DAY_US} - {_WEEK_START_DAY} AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL
    AND user_id IS NOT NULL AND value IS NOT NULL
), wk AS (
  SELECT user_id,
         {", ".join(
             f"CAST(coalesce(sum(CASE WHEN d = {i} THEN cents END), 0) AS BIGINT) AS v{i}"
             for i in range(7))}
  FROM ev WHERE d BETWEEN 0 AND 6
  GROUP BY user_id
)
SELECT user_id,
       CAST({" + ".join(
           f"(v{i} - {p}) * (v{i} - {p})"
           for i, p in enumerate(_PATTERN_CENTS))} AS BIGINT) AS sq_dist
FROM wk
ORDER BY sq_dist ASC, user_id ASC
LIMIT 20
""",
)
def q_series_pattern_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search against a fixed query pattern:
    each user's one-week daily purchase-cents series, distance =
    squared euclidean to the pattern in EXACT BIGINT (cents in, integer
    squares out — no float drift), top-20 closest with a total-order
    tiebreak. The weekly series materializes via SEVEN conditional sums
    in ONE groupBy (no gap-fill explode, no pivot shuffle, no window):
    a linear scan with map-side partials — the same plan answers "which
    users look like this load shape" at any corpus size. Users with no
    purchase that week simply have no series (matching the oracle);
    zeros fill only MISSING DAYS of active users."""
    ev = (
        load_events(spark, sf_dir)
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("ts_us").isNotNull() & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            "user_id",
            (F.expr(f"ts_us div {_DAY_US}") - _WEEK_START_DAY).alias("d"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .filter(F.col("d").between(0, 6))
    )
    wk = ev.groupBy("user_id").agg(*[
        F.coalesce(
            F.sum(F.when(F.col("d") == i, F.col("cents"))), F.lit(0)
        ).cast("bigint").alias(f"v{i}")
        for i in range(7)
    ])
    dist = None
    for i, p in enumerate(_PATTERN_CENTS):
        term = (F.col(f"v{i}") - p) * (F.col(f"v{i}") - p)
        dist = term if dist is None else dist + term
    return (
        wk.select("user_id", dist.cast("bigint").alias("sq_dist"))
        .orderBy(F.col("sq_dist").asc(), F.col("user_id").asc())
        .limit(20)
    )


_OHLC_BUCKET_US = 300_000_000  # 5-minute bars

_OHLC_SQL = f"""
WITH v AS (
  SELECT event_type,
         epoch_us(ts) // {_OHLC_BUCKET_US} AS bucket,
         epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts_us ASC, event_id ASC) AS rn_a,
         row_number() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts_us DESC, event_id DESC) AS rn_d
  FROM v
)
SELECT event_type, bucket,
       min(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       min(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
       count(*) AS n_events
FROM r GROUP BY event_type, bucket
"""


@declare("ohlc_bars_5min", oracle=_OHLC_SQL)
def q_ohlc_bars_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the canonical time-series compaction (open/
    high/low/close/volume per fixed bar): five-minute buckets by pure
    integer epoch division (timezone-proof), values in exact cents,
    open/close selected by row_number over the repo-wide (ts, event_id)
    total order so ties cannot flip the bar across engines. One
    shuffle on (type, bucket); both windows and the aggregate ride the
    same partitioning — Spark plans a single Exchange."""
    ev = load_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
        & F.col("ts_us").isNotNull()
    )
    v = ev.select(
        "event_type",
        F.expr(f"ts_us div {_OHLC_BUCKET_US}").alias("bucket"),
        "ts_us", "event_id",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy(
        F.asc("ts_us"), F.asc("event_id"))
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("ts_us"), F.desc("event_id"))
    r = v.select(
        "event_type", "bucket", "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("cents"))).alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.min(F.when(F.col("rn_d") == 1, F.col("cents"))).alias("close_cents"),
        F.count("*").alias("n_events"),
    )


_ROLLING_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT user_id,
         unnest(generate_series(day, day + INTERVAL 6 DAY,
                                INTERVAL 1 DAY))::DATE AS wday
  FROM du
)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       count(DISTINCT c.user_id) AS active_7d
FROM days d JOIN contrib c ON c.wday = d.day
GROUP BY d.day
"""


@declare("rolling_7d_active_users", oracle=_ROLLING_SQL)
def q_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (the WAU curve) — for every calendar
    day with activity, the distinct users active in [day-6, day].
    Window countDistinct over a RANGE frame doesn't exist in Spark (or
    in most engines), and the naive day×history range join is a
    nested loop; instead each (user, day) pair is EXPLODED into the
    ≤7 window-end days it contributes to, turning the computation
    into a plain equi-shuffle groupBy(count distinct) — the shape that
    scales, because a user-day contributes a bounded 7 rows no matter
    the corpus. Restricting to observed days is a broadcast equi-join
    against the tiny day dimension."""
    ev = load_events(spark, sf_dir).filter(
        F.col("ts_us").isNotNull() & F.col("user_id").isNotNull()
    )
    # day via integer µs arithmetic, NOT to_date(timestamp_micros(...)):
    # the latter shifts with the session timezone and the driver's
    # vanilla session doesn't pin one (same rationale as
    # daily_user_series_gapfilled above)
    du = ev.select(
        F.date_from_unix_date(
            F.floor(F.col("ts_us") / 86_400_000_000).cast("int")
        ).alias("day"),
        "user_id",
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"), F.date_add(F.col("day"), 6)
        )).alias("wday"),
    )
    return (
        contrib.join(F.broadcast(days), contrib.wday == days.day)
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


@declare(
    "mad_outlier_census",
    oracle="""
WITH c AS (
  SELECT o_orderpriority AS pri,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL
),
med AS (SELECT pri, median(cents) AS med FROM c GROUP BY pri),
dev AS (
  SELECT c.pri, abs(2 * c.cents - CAST(2 * m.med AS BIGINT)) AS dev2
  FROM c JOIN med m ON c.pri = m.pri
),
mad AS (SELECT pri, median(dev2) AS mad2 FROM dev GROUP BY pri)
SELECT d.pri AS o_orderpriority,
       CAST(min(m.med) AS DOUBLE) AS median_cents,
       CAST(min(a.mad2) / 2 AS DOUBLE) AS mad_cents,
       CAST(sum(CASE WHEN d.dev2 > 3 * a.mad2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       count(*) AS n_orders
FROM dev d JOIN mad a ON d.pri = a.pri JOIN med m ON d.pri = m.pri
GROUP BY d.pri
""",
)
def q_mad_outlier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group — median absolute deviation,
    the data-quality primitive that survives the very outliers it
    hunts (stddev-based z-scores don't). Two exact medians over
    integer cents: deviations are doubled (|2x − 2·med|) so the
    half-cent midpoint median stays an exact integer, and the flag
    rule dev2 > 3·MAD2 compares exactly representable doubles — no
    float tolerance anywhere. Scale shape: two groupBy passes over the
    fact and two tiny broadcast joins of the 5-row per-priority
    statistics."""
    from pyspark.sql import functions as F

    c = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    med = c.groupBy("pri").agg(
        F.percentile(F.col("cents"), F.lit(0.5)).alias("med"))
    dev = c.join(F.broadcast(med), "pri").select(
        "pri",
        F.abs(F.col("cents") * 2 - (F.col("med") * 2).cast("bigint"))
        .alias("dev2"),
    )
    mad = dev.groupBy("pri").agg(
        F.percentile(F.col("dev2"), F.lit(0.5)).alias("mad2"))
    return (
        dev.join(F.broadcast(mad), "pri").join(F.broadcast(med), "pri")
        .groupBy(F.col("pri").alias("o_orderpriority"))
        .agg(
            F.min("med").cast("double").alias("median_cents"),
            (F.min("mad2") / 2).cast("double").alias("mad_cents"),
            F.sum(F.when(F.col("dev2") > 3 * F.col("mad2"), 1).otherwise(0))
             .cast("bigint").alias("n_outliers"),
            F.count("*").alias("n_orders"),
        )
    )


@declare(
    "percentile_bands_by_priority",
    oracle="""
SELECT o_orderpriority,
       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25) AS p25_cents,
       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.50) AS p50_cents,
       quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75) AS p75_cents,
       count(*) AS n_orders
FROM orders WHERE o_totalprice IS NOT NULL
GROUP BY o_orderpriority
""",
)
def q_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quartile bands per group — the spread profile behind SLA
    dashboards and skew diagnosis. Type-7 linear interpolation over
    integer cents is exact in float64 in both engines (indices are
    dyadic fractions of small integers), so even the interpolated
    quartiles hash-match. The approx sketch twin remains the 100 TB
    default; this is the exact-verification path."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    ).select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.percentile(F.col("cents"), F.lit(0.25)).alias("p25_cents"),
        F.percentile(F.col("cents"), F.lit(0.50)).alias("p50_cents"),
        F.percentile(F.col("cents"), F.lit(0.75)).alias("p75_cents"),
        F.count("*").alias("n_orders"),
    )


# --- Dyadic-weighted trailing average (integer EWMA) ------------------------

# Window length of the dyadic trailing average: the newest sample gets
# weight 2^(W-1), each older one half that — a truncated exponential
# moving average whose weights are powers of two, so the whole smoother
# is exact BIGINT arithmetic (a float-alpha EWMA is reduction-order-
# dependent and its infinite tail is not window-expressible).
EWMA_WINDOW = 8


@declare(
    "user_value_ewma_dyadic",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
), lagged AS (
  SELECT user_id, ts_us, event_id,
         {" + ".join(
             f"coalesce(lag(cents, {i}) OVER w, 0) * {1 << (EWMA_WINDOW - 1 - i)}"
             for i in range(EWMA_WINDOW))} AS ewma_scaled,
         {" + ".join(
             "(CASE WHEN lag(cents, %d) OVER w IS NOT NULL THEN 1 ELSE 0 END)" % i
             for i in range(EWMA_WINDOW))} AS n_terms,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
)
SELECT user_id, CAST(ewma_scaled AS BIGINT) AS ewma_scaled,
       CAST(n_terms AS BIGINT) AS n_terms
FROM lagged WHERE rn = 1
""",
)
def q_user_value_ewma_dyadic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each user's CURRENT exponentially-smoothed spend: a dyadic
    trailing average over their last 8 event values — newest weighted
    2^7, halving with age — evaluated at the latest event. Weights
    that are powers of two make the smoother exact integer math (the
    integer-PageRank discipline applied to time-series smoothing);
    n_terms exposes how much history backs each estimate so consumers
    can discount cold users.

    Scale shape: ONE window sort per user partition computes all eight
    lags and the recency rank together (Spark collapses same-window
    functions into a single sort), then the rn = 1 filter keeps one
    row per user — no self-joins, no global sort, shuffle keyed on
    user_id only."""
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & F.col("ts_us").isNotNull()
                & F.col("value").isNotNull())
        .select("user_id", "ts_us", "event_id",
                F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_desc = Window.partitionBy("user_id").orderBy(
        F.desc("ts_us"), F.desc("event_id"))
    ewma = sum(
        F.coalesce(F.lag("cents", i).over(w), F.lit(0))
        * F.lit(1 << (EWMA_WINDOW - 1 - i))
        for i in range(EWMA_WINDOW)
    )
    n_terms = sum(
        F.when(F.lag("cents", i).over(w).isNotNull(), 1).otherwise(0)
        for i in range(EWMA_WINDOW)
    )
    return (
        ev.select(
            "user_id",
            ewma.cast("bigint").alias("ewma_scaled"),
            n_terms.cast("bigint").alias("n_terms"),
            F.row_number().over(w_desc).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@declare(
    "seasonal_revenue_anomaly_census",
    oracle="""
WITH daily AS (
  SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
           AS oday,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS day_cents
  FROM orders WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
),
wd AS (SELECT oday, oday % 7 AS weekday, day_cents FROM daily),
med AS (SELECT weekday, median(day_cents) AS med FROM wd GROUP BY weekday),
dev AS (
  SELECT w.oday, w.weekday, w.day_cents,
         abs(2 * w.day_cents - CAST(2 * m.med AS BIGINT)) AS dev2
  FROM wd w JOIN med m ON w.weekday = m.weekday
),
mad AS (SELECT weekday, median(dev2) AS mad2 FROM dev GROUP BY weekday)
SELECT d.oday, d.weekday, d.day_cents,
       CAST(m.med AS DOUBLE) AS weekday_median_cents,
       CAST(a.mad2 / 2 AS DOUBLE) AS weekday_mad_cents,
       d.dev2 > 3 * a.mad2 AS is_anomaly
FROM dev d JOIN mad a ON d.weekday = a.weekday
JOIN med m ON d.weekday = m.weekday
""",
)
def q_seasonal_revenue_anomaly_census(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Seasonality-aware anomaly detection on the daily revenue
    series: each day is judged against the robust baseline of ITS OWN
    weekday (median + MAD per weekday slot), so a quiet Sunday isn't
    flagged for being below the weekday mean and a spiked Sunday
    can't hide behind it — the mad_outlier_census discipline lifted
    from global to seasonal. The weekday slot is day-number mod 7
    from the corpus epoch: a pure non-negative integer both engines
    compute identically (dayofweek() conventions differ between
    Spark (1=Sun) and DuckDB (0=Sun) — mod arithmetic sidesteps the
    drift). Doubled deviations keep the half-cent median midpoint an
    exact integer; the 3-MAD flag compares exactly representable
    values — no float tolerance anywhere.

    Scale shape: the fact reduces to one row per day FIRST (map-side-
    combined groupBy), so the two median passes and the final census
    run over a days-sized relation (365·years rows at any corpus
    scale) with 7-row broadcast statistics."""
    from pyspark.sql import functions as F

    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull()
                & F.col("o_totalprice").isNotNull())
        .groupBy(
            F.datediff(F.col("o_orderdate").cast("date"),
                       F.lit("1992-01-01").cast("date"))
            .cast("bigint").alias("oday"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .alias("day_cents"))
    )
    wd = daily.select("oday", (F.col("oday") % 7).alias("weekday"),
                      "day_cents")
    med = wd.groupBy("weekday").agg(
        F.percentile(F.col("day_cents"), F.lit(0.5)).alias("med"))
    dev = wd.join(F.broadcast(med), "weekday").select(
        "oday", "weekday", "day_cents", "med",
        F.abs(F.col("day_cents") * 2 - (F.col("med") * 2).cast("bigint"))
        .alias("dev2"),
    )
    mad = dev.groupBy("weekday").agg(
        F.percentile(F.col("dev2"), F.lit(0.5)).alias("mad2"))
    return (
        dev.join(F.broadcast(mad), "weekday")
        .select(
            "oday", "weekday", "day_cents",
            F.col("med").cast("double").alias("weekday_median_cents"),
            (F.col("mad2") / 2).cast("double").alias("weekday_mad_cents"),
            (F.col("dev2") > 3 * F.col("mad2")).alias("is_anomaly"),
        )
    )
