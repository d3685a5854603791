"""Declared queries: data-layout family (Z-order clustering for
parquet data skipping).

The reference persists task files with no layout control
(``manager.py:230`` — one JSON per task, SURVEY.md §2.1); at 100 TB,
layout IS an operator: min/max row-group pruning only helps if rows
close in query space are close in file space. The Morton-code bucket
census below states the two-dimensional locality win as numbers the
DuckDB oracle replays bit-for-bit (the Z-value is pure shift/mask/or
arithmetic, identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.layout import (
    zorder_bucket_stats,
    zvalue_sql,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_table

# Two naturally-bounded integer dims over orders: customer key and the
# day number since the corpus epoch. Wall-clock date arithmetic on the
# naive parquet timestamp is session-timezone-proof (the interpretation
# tz cancels between read and date-extraction, same as orders_by_month).
_DIMS_SQL = """
SELECT o_custkey AS ckey,
       date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS oday
FROM orders
WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
"""

_ZSTATS_SQL = f"""
WITH dims AS ({_DIMS_SQL}),
bounds AS (
  SELECT min(ckey) AS amin, max(ckey) AS amax,
         min(oday) AS bmin, max(oday) AS bmax
  FROM dims
),
z AS (
  SELECT ckey, oday,
         {zvalue_sql('(((ckey - amin) * 65536) // (amax - amin + 1))',
                     '(((oday - bmin) * 65536) // (bmax - bmin + 1))')}
           >> 26 AS z_bucket
  FROM dims, bounds
)
SELECT z_bucket,
       count(*) AS n_rows,
       min(ckey) AS min_ckey, max(ckey) AS max_ckey,
       min(oday) AS min_oday, max(oday) AS max_oday
FROM z GROUP BY z_bucket
"""


@declare("zorder_bucket_stats", oracle=_ZSTATS_SQL)
def q_zorder_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout census over orders: each dimension is range-
    normalized to the 16-bit Morton domain by its observed min/max (one
    mergeable bounds aggregate, broadcast back as a single row), every
    row lands in one of 64 Morton range buckets (exactly the per-file
    Z-ranges ``zorder_write`` produces), and each bucket reports
    min/max of BOTH dimensions. Tight spans on customer key AND order
    day simultaneously — which no single-column sort can give — are
    the data-skipping property; the oracle recomputes the bounds CTE
    and the full magic-mask interleave ladder in SQL, so one wrong
    shift or mask anywhere breaks the hash."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    dims = orders.select(
        F.col("o_custkey").alias("ckey"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
        ).cast("bigint").alias("oday"),
    )
    return zorder_bucket_stats(dims, "ckey", "oday", n_buckets=64)
