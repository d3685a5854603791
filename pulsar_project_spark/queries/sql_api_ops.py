"""Declared queries: the ``spark.sql`` entry surface + data profiling.

Everything else in the registry is DataFrame-API; a complete engine also
answers raw SQL against the registered catalog (``sources.tables
.register_views``). The profiler is the data-quality sweep a pipeline
runs before training: one pass, all-exact aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table, register_views

_BRAND_VOLUME_SQL = """
SELECT p_brand,
       count(DISTINCT l_orderkey) AS n_orders,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 15
GROUP BY p_brand
"""


@declare("sql_brand_volume", oracle=_BRAND_VOLUME_SQL)
def q_sql_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL path: the IDENTICAL ANSI text runs on Spark (over
    registered temp views) and on DuckDB as its own oracle — the
    strongest possible statement of SQL-surface parity. Catalyst still
    plans it: p_size pushes into the part scan, part broadcasts."""
    register_views(spark, sf_dir)
    return spark.sql(_BRAND_VOLUME_SQL)


@declare(
    "profile_orders_table",
    oracle="""
SELECT count(*) AS n_rows,
       count(DISTINCT o_custkey) AS n_customers,
       count(DISTINCT o_orderstatus) AS n_statuses,
       CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_prices,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
""",
)
def q_profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profile sweep (row/null/distinct/min/max/sum) —
    the pre-training data-quality check. min/max of doubles are exact
    comparisons; the sum runs in DECIMAL. At 100 TB the same plan holds:
    one scan, map-side partials, singleton reduce."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias("null_prices"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
    )


_WINDOW_TOP3_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC
         ) AS rn
  FROM orders
)
SELECT o_orderpriority, o_orderkey, CAST(price AS DOUBLE) AS price, rn
FROM ranked WHERE rn <= 3
"""


@declare("sql_window_top3_orders", oracle=_WINDOW_TOP3_SQL)
def q_sql_window_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL path #2 — CTE + ranking window: the IDENTICAL ANSI text
    runs through ``spark.sql`` and as its own DuckDB oracle. Catalyst
    plans the window exactly as the DataFrame API would (one shuffle on
    the partition key; rank filter pushed into the window via the
    ``rn <= 3`` limit-pushdown rule)."""
    register_views(spark, sf_dir)
    return spark.sql(_WINDOW_TOP3_SQL)


_NATION_LOYALTY_SQL = """
WITH per_customer AS (
  SELECT c_nationkey, o_custkey, count(*) AS n_orders
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
)
SELECT n_name,
       count(*) AS n_repeat_customers,
       CAST(sum(n_orders) AS BIGINT) AS n_orders_total
FROM per_customer JOIN nation ON c_nationkey = n_nationkey
WHERE n_orders >= 3
GROUP BY n_name
HAVING count(*) >= 5
"""


@declare("sql_nation_repeat_customers", oracle=_NATION_LOYALTY_SQL)
def q_sql_nation_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL path #3 — chained CTE, two joins, HAVING: repeat
    customers (3+ orders) per nation, nations with 5+ of them. Same
    verbatim-text contract as the other sql_* queries; the nation join
    broadcasts, the orders⋈customer join shuffles on the customer key."""
    register_views(spark, sf_dir)
    return spark.sql(_NATION_LOYALTY_SQL)


_TRADE_VOLUME_IDENTICAL_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS volume,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


@declare("sql_trade_volume_identical", oracle=_TRADE_VOLUME_IDENTICAL_SQL)
def q_sql_trade_volume_identical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-SQL twin of ``nation_trade_volume``: the IDENTICAL ANSI
    text — six-table join with the SAME dimension aliased twice, exact
    DECIMAL volume, ``year()`` on the naive ship timestamp (wall-clock
    extraction, session-timezone-proof in both engines) — runs through
    ``spark.sql`` over registered views AND through DuckDB as its own
    oracle. The strongest SQL-surface parity statement for the round-5
    analytics shape; Catalyst still broadcasts the dims and pushes the
    inequality filter."""
    register_views(spark, sf_dir)
    return spark.sql(_TRADE_VOLUME_IDENTICAL_SQL)


_RECURSIVE_REACH_SQL = """
WITH RECURSIVE hops AS (
    SELECT 'view' AS node, 0 AS hop
  UNION ALL
    SELECT e.dst AS node, h.hop + 1 AS hop
    FROM hops h
    JOIN (
      SELECT DISTINCT src, dst FROM (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS dst
        FROM events
        WHERE user_id IS NOT NULL AND event_type IS NOT NULL
          AND ts IS NOT NULL AND event_id IS NOT NULL
      ) t WHERE dst IS NOT NULL AND dst <> src
    ) e ON e.src = h.node
    WHERE h.hop < 4
)
SELECT node, min(hop) AS min_hop, count(*) AS n_walks
FROM hops GROUP BY node
"""


@declare("sql_recursive_reachability", oracle=_RECURSIVE_REACH_SQL)
def q_sql_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE on the Spark 4 SQL surface (new engine
    capability this round): bounded-depth reachability over the
    observed event-type transition graph — the seed is 'view', each
    round follows every distinct (src, dst) transition edge, depth
    capped at 4 (the node set is the 5 event types, so 4 hops reach
    everything reachable). The IDENTICAL ANSI text runs on Spark and
    as its own DuckDB oracle; min-hop AND the bounded-walk count must
    both match, so the two engines' recursion semantics (bag UNION
    ALL, per-round join) are certified against each other. The
    deterministic-edge guard drops NULL ts/event_id rows because the
    engines disagree on NULL ordering inside LEAD's window sort.

    Scale shape: the edge derivation is one window pass + DISTINCT
    over a 25-cell domain; each recursion round joins a <=5-row
    frontier against a broadcast 25-row edge set — the recursion is
    metadata-sized no matter the corpus."""
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_REACH_SQL)


_LATERAL_ORDER_PROFILE_SQL = """
SELECT c.c_custkey, c.c_name, o.top_price, o.n_orders
FROM customer c,
LATERAL (
  SELECT max(o_totalprice) AS top_price, count(*) AS n_orders
  FROM orders WHERE o_custkey = c.c_custkey
) o
WHERE c.c_acctbal > 9000
"""


@declare("sql_lateral_order_profile", oracle=_LATERAL_ORDER_PROFILE_SQL)
def q_sql_lateral_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery on the SQL surface: per rich
    customer, an inline aggregate over exactly their orders. Catalyst
    DECORRELATES this (no per-row re-execution, no nested loop — the
    plan audit enforces it): the subquery becomes one grouped
    aggregate joined back on the correlation key, which is the 100 TB
    shape. Customers with no orders keep their row (scalar aggregate
    over zero rows -> NULL max, 0 count) — the semantics LATERAL
    guarantees and a plain inner join would lose; identical text is
    its own DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_ORDER_PROFILE_SQL)
