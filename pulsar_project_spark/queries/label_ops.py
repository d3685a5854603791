"""Declared query: label stamps, fact-key generation, and robust URL
join — the last §2.8 utility family (SURVEY.md §2.8; reference
``utils.py:12-39``, ``memory.py:347-350``).

One oracle-checked query covers the deterministic forms of all three:
the ``%Y%m%d_%H%M%S_%f`` datetime stamp rebuilt from integer microsecond
arithmetic (tz-free on both engines), the ``fact_{stamp}_{i}`` keys via
posexplode over a per-row facts list, and the path-preserving URL join
over base/rel variants that hit every branch of the reference's
implementation. The true-random label (``rand()`` suffix) is inherently
non-oracle-comparable and is pinned by unit test instead
(tests/test_label_utils.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.labels import (
    datetime_stamp,
    fact_key,
    label_suffix,
    robust_urljoin,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

# DuckDB twins of functions/labels.py (integer micro arithmetic — same
# numbers on both engines, no timezone in sight)
_STAMP_SQL = """
strftime(DATE '1970-01-01' + CAST(ts_us // 86400000000 AS INT), '%Y%m%d')
 || '_' || lpad(CAST((ts_us % 86400000000) // 3600000000 AS VARCHAR), 2, '0')
 || lpad(CAST((ts_us % 3600000000) // 60000000 AS VARCHAR), 2, '0')
 || lpad(CAST((ts_us % 60000000) // 1000000 AS VARCHAR), 2, '0')
 || '_' || lpad(CAST(ts_us % 1000000 AS VARCHAR), 6, '0')
"""

_SUFFIX_SQL = (
    "lpad(CAST((('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT)"
    " % 1000 AS VARCHAR), 3, '0')"
)

_BASE_SQL = """CASE ((event_id % 4 + 4) % 4)
  WHEN 0 THEN 'https://example.com'
  WHEN 1 THEN 'https://example.com/'
  WHEN 2 THEN 'https://example.com/api/v1/'
  ELSE 'https://example.com/api/v1' END"""

_REL_SQL = """CASE ((event_id % 2 + 2) % 2)
  WHEN 0 THEN 'docs/' || CAST(user_id AS VARCHAR)
  ELSE '/docs/' || CAST(user_id AS VARCHAR) END"""

_URLJOIN_SQL = f"""
CASE WHEN regexp_extract(base, '^\\w+://[^/]*(/.*)?$', 1) IN ('', '/')
     THEN regexp_extract(base, '^(\\w+://[^/]*)', 1) ||
          (CASE WHEN rel <> '' AND rel NOT LIKE '/%' THEN '/' || rel ELSE rel END)
     ELSE regexp_extract(base, '^(\\w+://[^/]*)', 1) ||
          regexp_replace(regexp_extract(base, '^\\w+://[^/]*(/.*)?$', 1), '/+$', '')
          || '/' || regexp_replace(rel, '^/+', '')
END"""


@declare(
    "label_fact_urljoin",
    oracle=f"""
WITH src AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id,
         {_BASE_SQL} AS base, {_REL_SQL} AS rel
  FROM events
), stamped AS (
  SELECT event_id, {_STAMP_SQL.strip()} AS stamp,
         {_SUFFIX_SQL} AS suffix, base, rel
  FROM src
)
SELECT event_id,
       stamp || '_' || suffix AS label,
       i AS fact_i,
       'fact_' || stamp || '_' || CAST(i AS VARCHAR) AS fact_key,
       {_URLJOIN_SQL.strip()} AS url
FROM stamped, generate_series(0, 2) AS t(i)
""",
)
def q_label_fact_urljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic get_random_label / fact-key / robust_urljoin over
    events: stamp from the row's event time (utils.py:12-13), '%03d'
    suffix from md5(event_id) (utils.py:15-16 derandomized), 3 fact
    keys per event (memory.py:347-350 enumerate), and every base/rel
    branch of robust_urljoin (utils.py:18-39). Pure column expressions
    — one narrow projection + one posexplode, no shuffle at all."""
    ev = load_events(spark, sf_dir)
    base = (
        F.when(F.pmod("event_id", F.lit(4)) == 0, F.lit("https://example.com"))
        .when(F.pmod("event_id", F.lit(4)) == 1, F.lit("https://example.com/"))
        .when(F.pmod("event_id", F.lit(4)) == 2, F.lit("https://example.com/api/v1/"))
        .otherwise(F.lit("https://example.com/api/v1"))
    )
    rel = F.when(
        F.pmod("event_id", F.lit(2)) == 0,
        F.concat(F.lit("docs/"), F.col("user_id").cast("string")),
    ).otherwise(F.concat(F.lit("/docs/"), F.col("user_id").cast("string")))
    stamped = ev.select(
        "event_id",
        datetime_stamp(F.col("ts_us")).alias("stamp"),
        label_suffix(F.col("event_id")).alias("suffix"),
        base.alias("base"),
        rel.alias("rel"),
    )
    return stamped.select(
        "event_id",
        F.concat("stamp", F.lit("_"), "suffix").alias("label"),
        F.posexplode(F.sequence(F.lit(0), F.lit(2))).alias("__p", "fact_i"),
        "stamp", "base", "rel",
    ).select(
        "event_id",
        "label",
        F.col("fact_i").cast("bigint").alias("fact_i"),
        fact_key(F.col("stamp"), F.col("fact_i")).alias("fact_key"),
        robust_urljoin(F.col("base"), F.col("rel")).alias("url"),
    )
