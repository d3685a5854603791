"""Declared queries: full analytic plans over the star schema.

These are the engine's headline reporting queries (bench.py runs them at
sf0.1). Each is written the way it should execute on a 1000-executor
cluster over 100 TB:

* dimension joins are BROADCAST (region/nation/customer/supplier/part
  stay catalog-sized at any fact scale);
* fact-side filters sit directly on the scan (pushed into parquet);
* measure sums run in DECIMAL — exact and associative, so Spark's
  map-side partial aggregation is bit-identical to any single-node
  ordering (and to the DuckDB oracle);
* every top-k carries a unique tiebreak and executes as
  TakeOrderedAndProject (per-partition heap), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

# Exact decimal building blocks: prices have 2 decimals, rates 2 decimals.
_PRICE = 'CAST(l_extendedprice AS DECIMAL(18,2))'
_DISC = '(1 - CAST(l_discount AS DECIMAL(4,2)))'
_TAXF = '(1 + CAST(l_tax AS DECIMAL(4,2)))'


def _price(col: str = "l_extendedprice") -> Column:
    return F.col(col).cast("decimal(18,2)")


def _disc_factor() -> Column:
    return F.lit(1) - F.col("l_discount").cast("decimal(4,2)")


def _tax_factor() -> Column:
    return F.lit(1) + F.col("l_tax").cast("decimal(4,2)")


@declare(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum({_PRICE}) AS DOUBLE) AS sum_base_price,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS sum_disc_price,
       CAST(sum({_PRICE} * {_DISC} * {_TAXF}) AS DOUBLE) AS sum_charge,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-side filter + one hash agg.
    The filter reaches the parquet scan (PushedFilters); everything else
    is map-side partial agg + a 9-group shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-06-30").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(_price()).cast("double").alias("sum_base_price"),
            F.sum(_price() * _disc_factor()).cast("double").alias("sum_disc_price"),
            F.sum(_price() * _disc_factor() * _tax_factor()).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count("*")).cast("double").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@declare(
    "top_revenue_orders",
    oracle=f"""
SELECT o_orderkey,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
""",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: broadcast the filtered customer dim into orders,
    shuffle-join lineitem on orderkey, aggregate, global top-10 heap."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_price() * _disc_factor()).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@declare(
    "national_revenue",
    oracle=f"""
SELECT n_name, r_name,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
""",
)
def q_national_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: the fact table streams once through a chain of
    broadcast joins (supplier → nation → region snowflake), then one agg.
    Zero fact-side shuffles before the 25-group aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(_price() * _disc_factor()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@declare(
    "orders_by_month",
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS month_value
FROM orders
GROUP BY order_month, o_orderstatus
""",
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup on the ntz order date — date_format is tz-free on
    TIMESTAMP_NTZ, so parity holds under any driver session timezone."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("month_value"),
        )
    )


@declare(
    "user_event_windows",
    oracle="""
SELECT event_id, user_id, value,
       row_number() OVER w AS seq_in_user,
       lag(value) OVER w AS prev_value,
       value - coalesce(lag(value) OVER w, 0.0) AS value_delta
FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
""",
)
def q_user_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions over the event stream: per-user ordinal,
    lag, delta. One shuffle on user_id, sorted once, all three window
    functions share the frame."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.row_number().over(w).alias("seq_in_user"),
        F.lag("value").over(w).alias("prev_value"),
        (F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0.0))).alias("value_delta"),
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@declare(
    "sessionization",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM ordered
), numbered AS (
  SELECT user_id, event_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM numbered
GROUP BY user_id, session_seq
""",
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → cumulative sum
    of session-start flags → per-session rollup. The standard batch
    sessionizer; the streaming twin uses session windows (streaming/)."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.select(
        "user_id", "event_id", "ts_us",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > _SESSION_GAP_US),
            1,
        ).otherwise(0).alias("new_session"),
    )
    numbered = flagged.select(
        "user_id", "event_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_seq"),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


@declare(
    "conversion_funnel",
    oracle="""
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_value
FROM events
GROUP BY user_id
""",
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation funnel — one pass, no joins, no pivot
    shuffle: the per-type counters are map-side partial aggregates."""
    ev = load_events(spark, sf_dir)
    zero = F.lit(0).cast("decimal(18,2)")
    return ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_views"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_clicks"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_purchases"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("value").cast("decimal(18,2)")).otherwise(zero)
        ).cast("double").alias("purchase_value"),
    )


@declare(
    "nation_trade_volume",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       strftime(l_shipdate, '%Y') AS ship_year,
       CAST(sum({_PRICE} * {_DISC}) AS DOUBLE) AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, ship_year
""",
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: cross-border revenue per
    (supplier nation, customer nation, ship year). Plan shape this adds
    to the audit surface: the SAME dimension (nation) broadcast twice
    under different roles — the fact stream passes one orderkey hash
    join (fact-fact) and four broadcast hash joins, then a single
    grouped aggregate; zero fact-side shuffles beyond the orderkey
    join. Wall-clock year off the naive ship timestamp is
    session-timezone-proof (same mechanism as ``orders_by_month``)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), sup.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.date_format("l_shipdate", "yyyy").alias("ship_year"),
        )
        .agg(
            F.sum(_price() * _disc_factor()).cast("double").alias("volume"),
            F.count("*").alias("n_items"),
        )
    )


@declare(
    "market_share_by_year",
    oracle=f"""
WITH vol AS (
  SELECT strftime(o_orderdate, '%Y') AS order_year,
         n1.n_name AS supp_nation,
         {_PRICE} * {_DISC} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
)
SELECT order_year,
       CASE WHEN sum(volume) = 0 THEN NULL
            ELSE CAST(sum(CASE WHEN supp_nation = 'NATION_0' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE) END AS mkt_share,
       CAST(sum(volume) AS DOUBLE) AS total_volume,
       count(*) AS n_items
FROM vol GROUP BY order_year
""",
)
def q_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: NATION_0's fraction of total sold
    volume per order year — a conditional aggregate over the same
    broadcast-snowflake stream as Q7, with the share emitted as ONE
    double division over two exactly-summed DECIMAL totals (the
    repo-wide float discipline: the only float op is the final
    correctly-rounded division)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select(
            F.date_format("o_orderdate", "yyyy").alias("order_year"),
            F.col("n_name").alias("supp_nation"),
            (_price() * _disc_factor()).alias("volume"),
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    # all-zero-volume years yield NULL share, not a DIVIDE_BY_ZERO under
    # ANSI (and not a NaN-vs-NULL hash mismatch) — guarded identically
    # in the oracle
    return vol.groupBy("order_year").agg(
        F.when(
            F.sum("volume") != 0,
            F.sum(F.when(F.col("supp_nation") == "NATION_0",
                         F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double"),
        ).alias("mkt_share"),
        F.sum("volume").cast("double").alias("total_volume"),
        F.count("*").alias("n_items"),
    )


@declare(
    "session_path_trigrams",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev_ts
  FROM events WHERE event_type IS NOT NULL
), numbered AS (
  SELECT user_id, event_id, event_type, ts_us,
         CAST(sum(CASE WHEN prev_ts IS NULL
                            OR ts_us - prev_ts > {_SESSION_GAP_US}
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM ordered
), grams AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM numbered
  WINDOW w AS (PARTITION BY user_id, session_seq
               ORDER BY ts_us, event_id)
)
SELECT t1, t2, t3, count(*) AS n_paths
FROM grams WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY t1, t2, t3
ORDER BY n_paths DESC, t1 ASC, t2 ASC, t3 ASC LIMIT 20
""",
)
def q_session_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path DISCOVERY — the open-ended twin of the fixed-stage funnel
    (``ordered_funnel_stages`` asks 'how many users did A→B→C'; this
    asks 'WHICH three-step paths dominate'): sessionize (same 30-min
    gap machinery), slide a trigram window over each session's ordered
    event types, counts them globally, top-20 with full total-order
    tiebreaks. Trigrams never cross session boundaries (the lead
    window is partitioned by session). One (user) sort feeds
    sessionization AND the gram window; the count is a tiny grouped
    agg (≤ |types|³ groups) with map-side partials."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    numbered = ev.select(
        "user_id", "event_id", "event_type", "ts_us",
        F.sum(
            F.when(
                F.lag("ts_us").over(w).isNull()
                | ((F.col("ts_us") - F.lag("ts_us").over(w))
                   > _SESSION_GAP_US),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(W.unboundedPreceding, 0)).alias("session_seq"),
    )
    wg = W.partitionBy("user_id", "session_seq").orderBy("ts_us", "event_id")
    grams = numbered.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(wg).alias("t2"),
        F.lead("event_type", 2).over(wg).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        grams.groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.col("n_paths").desc(), F.col("t1").asc(),
                 F.col("t2").asc(), F.col("t3").asc())
        .limit(20)
    )


@declare(
    "user_journey_strings",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT user_id,
       array_to_string(
         (list(event_type ORDER BY ts_us, event_id))[1:10], '>'
       ) AS journey,
       count(*) AS n_events
FROM ev GROUP BY user_id
""",
)
def q_user_journey_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — the classic cross-engine trap done
    right: each user's first ten event types in (ts, event_id) order as
    one '>'-joined journey string. ``collect_list`` order is explicitly
    NON-deterministic across a shuffle, so the order rides INSIDE the
    data: collect structs keyed by the total order, ``array_sort``,
    slice, project, join — the same fix the BPE merge table uses
    (operators/text_analysis.py). One shuffle on user_id; the
    ten-element cap bounds the aggregation state per key."""
    ev = load_events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
        & F.col("ts_us").isNotNull()
    )
    journey = F.array_join(
        F.transform(
            F.slice(
                F.sort_array(F.collect_list(
                    F.struct("ts_us", "event_id", "event_type"))),
                1, 10,
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return ev.groupBy("user_id").agg(
        journey.alias("journey"),
        F.count("*").alias("n_events"),
    )


_HIST_BINS = 10


@declare(
    "value_equiwidth_histogram",
    oracle=f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
bounds AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
SELECT event_type,
       CAST(least({_HIST_BINS - 1},
                  ((cents - lo) * {_HIST_BINS}) // (hi - lo + 1))
            AS INTEGER) AS bin,
       count(*) AS n
FROM c, bounds
GROUP BY 1, 2
""",
)
def q_value_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width value histogram per event type over GLOBAL observed
    bounds (one mergeable min/max aggregate broadcast back — the
    zorder_bucket_stats normalization pattern at 1 dimension): the
    profiling view that makes distribution drift between types visible
    on one axis. Integer cents and integer bin math keep the oracle
    bit-stable; the least() guard pins the max value into the last
    bin."""
    c = load_events(spark, sf_dir).filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    bounds = c.agg(F.min("cents").alias("lo"), F.max("cents").alias("hi"))
    return (
        c.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.least(
                F.lit(_HIST_BINS - 1),
                F.expr(f"((cents - lo) * {_HIST_BINS}) div (hi - lo + 1)"),
            ).cast("int").alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("n"))
    )
