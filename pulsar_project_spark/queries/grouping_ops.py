"""Declared queries: multi-level aggregation (ROLLUP / grouping sets).

Absent from the reference (SURVEY.md §2.4 "no grouping sets") but part
of a complete analytic surface; revenue runs in DECIMAL so subtotal
sums are order-independent under partial aggregation. NULL group keys
from rollup levels are coalesced to 'ALL' on both sides — unambiguous
here because r_name/n_name are never null in the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@declare(
    "revenue_rollup_region_nation",
    oracle=f"""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(n_name, 'ALL') AS nation,
       CAST(sum({_REV}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation → grand-total revenue rollup. The fact table
    joins only broadcast dimensions (customer/nation/region), then ONE
    shuffle computes every rollup level (Spark Expand + partial agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "revenue", "n_items",
        )
    )


@declare(
    "cube_orders_status_priority",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over two low-cardinality keys: all four grouping sets
    from ONE shuffle (Spark Expand multiplies rows by the set count
    before the partial agg — fine for low-cardinality cube keys, the
    only kind a sane cube uses at 100 TB)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders", "total_price",
        )
    )


@declare(
    "grouping_sets_region_priority",
    oracle="""
SELECT coalesce(r_name, 'ALL') AS region,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (o_orderpriority))
""",
)
def q_grouping_sets_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the two single-key marginals in one
    pass, the piece of the ROLLUP/CUBE family neither covers (no
    (region, priority) cell, no grand total). Same Expand + one-shuffle
    execution; dimensions broadcast. Registered via the SQL API: the
    sets are declared, not assembled by unioning two aggregates."""
    for t in ("orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"gs_{t}")
    return spark.sql("""
        SELECT coalesce(r_name, 'ALL') AS region,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n_orders
        FROM gs_orders
        JOIN gs_customer ON o_custkey = c_custkey
        JOIN gs_nation   ON c_nationkey = n_nationkey
        JOIN gs_region   ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (o_orderpriority))
    """)


_UNPIVOT_SQL = """
SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
       event_type,
       count(*) AS n
FROM events
WHERE event_type IN ('click', 'view', 'purchase', 'signup', 'error')
GROUP BY 1, 2
"""
# ^ the IN mirrors the pivot's EXPLICIT column list (the scale-correct
# pivot form): a value outside the pinned list — including NULL — never
# becomes a matrix column, so the long-form oracle must exclude it too.


@declare("unpivot_event_matrix", oracle=_UNPIVOT_SQL)
def q_unpivot_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT → UNPIVOT inverse proof: the day × event-type count matrix
    (the pivot family's wide form) melted back to long form must equal
    the direct long aggregate — which is exactly what the oracle
    computes. Zero-count cells pivot to NULL and are dropped on melt,
    so the inverse is exact.

    Scale shape: the pivot is one shuffle on day with 5 tagged count
    partials per row; the unpivot (melt) is a map-side Expand — no
    second data-sized shuffle."""
    ev = load_events(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    wide = (
        ev.select(F.expr("ts_us div 86400000000").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    long = wide.unpivot("day", types, "event_type", "n")
    return long.filter(F.col("n").isNotNull()).select(
        "day", "event_type", F.col("n").cast("bigint").alias("n")
    )


# --- Round 9 (continuation): k-anonymity governance census --------------------

_K_ANON = 5

_K_ANON_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       year(o_orderdate) * 100 + month(o_orderdate) AS ym,
       CAST(count(*) AS BIGINT) AS n_rows,
       count(*) < {_K_ANON} AS at_risk
FROM orders
GROUP BY o_orderstatus, o_orderpriority,
         year(o_orderdate) * 100 + month(o_orderdate)
"""


@declare("k_anonymity_census", oracle=_K_ANON_SQL)
def q_k_anonymity_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY audit (Sweeney 2002) — the data-governance gate a
    training-data pipeline runs before release: group the corpus by
    its quasi-identifier tuple (here order status x priority x month)
    and flag every cell whose population is below k={_K_ANON} — the
    cells where a joined external dataset could re-identify
    individuals, which a release either suppresses or generalizes.
    NULL quasi-identifiers form their own cells (SQL grouping), which
    is the conservative reading: unknown attributes still partition
    the population.

    Scale shape: one partial-aggregated groupBy over a pruned
    three-column projection; output is bounded by the quasi-id domain
    (|status| x |priority| x months), not the row count — at 100 TB
    the audit costs one scan and returns kilobytes. The flag rides in
    the relation so downstream suppression is a semi-join, not a
    second scan.""".replace("{_K_ANON}", str(_K_ANON))
    orders = load_table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias("ym")
    return orders.groupBy("o_orderstatus", "o_orderpriority", ym).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) < _K_ANON).alias("at_risk"),
    )
