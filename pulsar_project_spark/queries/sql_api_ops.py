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
